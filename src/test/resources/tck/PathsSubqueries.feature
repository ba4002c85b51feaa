# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: PathsSubqueries

  Scenario: length of a matched path
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})-[:R]->(:C {k: 3})
      """
    When executing query:
      """
      MATCH p = (:A)-[:R*1..3]->(x)
      RETURN x.k AS k, length(p) AS len
      """
    Then the result should be, in any order:
      | k | len |
      | 2 | 1   |
      | 3 | 2   |

  Scenario: nodes and relationships of a path have matching sizes
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})-[:R]->(:C {k: 3})
      """
    When executing query:
      """
      MATCH p = (:A)-[:R*2..2]->(:C)
      RETURN size(nodes(p)) AS nn, size(relationships(p)) AS nr
      """
    Then the result should be, in any order:
      | nn | nr |
      | 3  | 2  |

  Scenario: shortestPath length between bound endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (a:S {k: 1})-[:R]->(b:M {k: 2})-[:R]->(c:E {k: 3})
      CREATE (a)-[:R]->(c)
      """
    When executing query:
      """
      MATCH (a:S), (c:E)
      MATCH p = shortestPath((a)-[:R*..4]->(c))
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 1   |

  Scenario: Relationship uniqueness within one MATCH pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R]->(b:N {k: 2})
      """
    When executing query:
      """
      MATCH (a)-[r1:R]->(b)-[r2:R]-(c)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Pattern predicate in WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {k: 1})-[:HAS]->(:Q)
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:HAS]->(:Q) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: Negated pattern predicate
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {k: 1})-[:HAS]->(:Q)
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT (p)-[:HAS]->() RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: EXISTS subquery in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:HAS]->(:Q)
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.k AS k, EXISTS { MATCH (p)-[:HAS]->() } AS has
      """
    Then the result should be, in any order:
      | k | has   |
      | 1 | true  |
      | 2 | false |

  Scenario: COUNT subquery in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {k: 1})
      CREATE (a)-[:HAS]->(:Q), (a)-[:HAS]->(:Q)
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.k AS k, COUNT { MATCH (p)-[:HAS]->() } AS n
      """
    Then the result should be, in any order:
      | k | n |
      | 1 | 2 |
      | 2 | 0 |

  Scenario: Uncorrelated CALL subquery cross-joins its result
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 10})
      """
    When executing query:
      """
      UNWIND [1, 2] AS x
      CALL { MATCH (n:N) RETURN n.v AS v }
      RETURN x, v
      """
    Then the result should be, in any order:
      | x | v  |
      | 1 | 10 |
      | 2 | 10 |

  Scenario: Correlated CALL subquery with importing WITH
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      CALL { WITH x RETURN x * 10 AS y }
      RETURN x, y
      """
    Then the result should be, in any order:
      | x | y  |
      | 1 | 10 |
      | 2 | 20 |
      | 3 | 30 |

  Scenario: Correlated CALL subquery containing a nested CALL subquery
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x
      CALL {
        WITH x
        CALL { WITH x RETURN x * 100 AS h }
        RETURN h + x AS y
      }
      RETURN x, y
      """
    Then the result should be, in any order:
      | x | y   |
      | 1 | 101 |
      | 2 | 202 |

  Scenario: Correlated CALL subquery with a procedure call inside
    Given an empty graph
    And having executed:
      """
      CREATE (:L1 {k: 1}), (:L2 {k: 2})
      """
    When executing query:
      """
      UNWIND [1] AS x
      CALL {
        WITH x
        CALL db.labels() YIELD label
        RETURN count(label) AS nlabels
      }
      RETURN x, nlabels
      """
    Then the result should be, in any order:
      | x | nlabels |
      | 1 | 2       |

  Scenario: Pattern comprehension collects per row
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {k: 1})
      CREATE (a)-[:HAS]->(:Q {v: 5}), (a)-[:HAS]->(:Q {v: 7})
      """
    When executing query:
      """
      MATCH (p:P {k: 1})
      RETURN size([(p)-[:HAS]->(q) | q.v]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: FOREACH applies updates per element
    Given an empty graph
    And having executed:
      """
      FOREACH (i IN [1, 2, 3] | CREATE (:F {v: i}))
      """
    When executing query:
      """
      MATCH (f:F) RETURN count(*) AS c, sum(f.v) AS s
      """
    Then the result should be, in any order:
      | c | s |
      | 3 | 6 |

  Scenario: OPTIONAL MATCH then aggregation counts only matches
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {k: 1})-[:R]->(:Q)
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:R]->(q)
      RETURN p.k AS k, count(q) AS c
      """
    Then the result should be, in any order:
      | k | c |
      | 1 | 1 |
      | 2 | 0 |
