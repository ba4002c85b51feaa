# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: ReturnWhere

  Scenario: ORDER BY ascending with LIMIT
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 3}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v LIMIT 2
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: ORDER BY descending with SKIP
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 3}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v DESC SKIP 1
      """
    Then the result should be, in order:
      | v |
      | 2 |
      | 1 |

  Scenario: Missing properties sort last ascending
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 2, w: 1}), (:N {v: 1, w: 2}), (:N {w: 3})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v, n.w AS w ORDER BY v
      """
    Then the result should be, in order:
      | v    | w |
      | 1    | 2 |
      | 2    | 1 |
      | null | 3 |

  Scenario: RETURN DISTINCT removes duplicate rows
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN DISTINCT n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |

  Scenario: DISTINCT treats missing values as equal
    Given an empty graph
    And having executed:
      """
      CREATE (:N), (:N), (:N {v: 1})
      """
    When executing query:
      """
      MATCH (n:N) RETURN DISTINCT n.v AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
      | 1    |

  Scenario: WHERE with AND and OR
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3}), (:N {v: 4})
      """
    When executing query:
      """
      MATCH (n:N) WHERE (n.v > 3 OR n.v = 1) AND n.v <> 4
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: WHERE comparison with a missing property filters the row
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.v < 10 RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: IS NULL and IS NOT NULL
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.v IS NULL RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: String predicates STARTS WITH, ENDS WITH, CONTAINS
    Given an empty graph
    And having executed:
      """
      CREATE (:N {s: 'apple'}), (:N {s: 'banana'}), (:N {s: 'grape'})
      """
    When executing query:
      """
      MATCH (n:N)
      WHERE n.s STARTS WITH 'a' OR n.s ENDS WITH 'pe' OR n.s CONTAINS 'nan'
      RETURN n.s AS s
      """
    Then the result should be, in any order:
      | s        |
      | 'apple'  |
      | 'banana' |
      | 'grape'  |

  Scenario: IN over a literal list
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 5})
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.v IN [1, 5, 9] RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 5 |

  Scenario: RETURN an expression over multiple variables
    Given an empty graph
    And having executed:
      """
      CREATE (:A {x: 3})-[:R {w: 4}]->(:B {y: 5})
      """
    When executing query:
      """
      MATCH (a:A)-[r:R]->(b:B)
      RETURN a.x + r.w + b.y AS total
      """
    Then the result should be, in any order:
      | total |
      | 12    |

  Scenario: ORDER BY on an aliased expression not in the output
    Given an empty graph
    And having executed:
      """
      CREATE (:N {a: 1, b: 9}), (:N {a: 2, b: 5}), (:N {a: 3, b: 7})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.a AS a ORDER BY n.b DESC
      """
    Then the result should be, in order:
      | a |
      | 1 |
      | 3 |
      | 2 |
