# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: PathsAggregates

  Scenario: UNION with mismatched column names is an error
    Given any graph
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 2 AS b
      """
    Then a SyntaxError should be raised at compile time

  Scenario: percentileDisc picks an actual value
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 10}), (:N {v: 20}), (:N {v: 30}), (:N {v: 40})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileDisc(n.v, 0.5) AS p
      """
    Then the result should be, in any order:
      | p  |
      | 20 |

  Scenario: percentileCont interpolates
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 10}), (:N {v: 20})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileCont(n.v, 0.5) AS p
      """
    Then the result should be, in any order:
      | p    |
      | 15.0 |

  Scenario: stDev of a two-value sample
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N) RETURN round(stDev(n.v), 4) AS sd
      """
    Then the result should be, in any order:
      | sd     |
      | 1.4142 |

  Scenario: length of a named single-hop path is one
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    When executing query:
      """
      MATCH p = (:A)-[:R]->(:B)
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 1   |

  Scenario: counting distinct paths in a diamond
    Given an empty graph
    And having executed:
      """
      CREATE (a:S {k: 0}), (d:E {k: 3})
      CREATE (a)-[:R]->(:M {k: 1})-[:R]->(d)
      CREATE (a)-[:R]->(:M {k: 2})-[:R]->(d)
      """
    When executing query:
      """
      MATCH (s:S)-[:R*2..2]->(e:E)
      RETURN count(*) AS paths
      """
    Then the result should be, in any order:
      | paths |
      | 2     |

  Scenario: aggregation and DISTINCT combined in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:N {g: 'a', v: 1}), (:N {g: 'a', v: 1})
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN DISTINCT n.g AS g, sum(n.v) AS s
      """
    Then the result should be, in any order:
      | g   | s |
      | 'a' | 2 |

  Scenario: min over a mixed numeric column is numeric
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 2}), (:N {v: 1.5})
      """
    When executing query:
      """
      MATCH (n:N) RETURN min(n.v) AS lo, max(n.v) AS hi
      """
    Then the result should be, in any order:
      | lo  | hi  |
      | 1.5 | 2.0 |

  Scenario: collect preserves per-group ordering established by WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:N {g: 'a', v: 3}), (:N {g: 'a', v: 1}), (:N {g: 'a', v: 2})
      """
    When executing query:
      """
      MATCH (n:N) WITH n.g AS g, n.v AS v ORDER BY v DESC
      RETURN g, collect(v) AS vs
      """
    Then the result should be, in any order:
      | g   | vs        |
      | 'a' | [3, 2, 1] |
