# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: UnwindWithUnion

  Scenario: UNWIND a literal list
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |
      | 3 |

  Scenario: UNWIND an empty list produces no rows
    Given any graph
    When executing query:
      """
      UNWIND [] AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND null produces no rows
    Given any graph
    When executing query:
      """
      UNWIND null AS x RETURN x
      """
    Then the result should be empty

  Scenario: Nested UNWIND forms the cross product
    Given any graph
    When executing query:
      """
      UNWIND [1, 2] AS x UNWIND ['a', 'b'] AS y RETURN x, y
      """
    Then the result should be, in any order:
      | x | y   |
      | 1 | 'a' |
      | 1 | 'b' |
      | 2 | 'a' |
      | 2 | 'b' |

  Scenario: WITH renames and projects
    Given any graph
    When executing query:
      """
      WITH 42 AS answer, 'x' AS tag
      RETURN answer, tag
      """
    Then the result should be, in any order:
      | answer | tag |
      | 42     | 'x' |

  Scenario: WITH ORDER BY LIMIT pipelines the top rows onward
    Given any graph
    When executing query:
      """
      UNWIND [5, 3, 9, 1] AS x
      WITH x ORDER BY x DESC LIMIT 2
      RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 14 |

  Scenario: WITH DISTINCT dedups mid-query
    Given any graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3] AS x
      WITH DISTINCT x
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: UNION distinct merges and dedups branch rows
    Given any graph
    When executing query:
      """
      RETURN 1 AS v UNION RETURN 2 AS v UNION RETURN 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |

  Scenario: UNION ALL keeps duplicates
    Given any graph
    When executing query:
      """
      RETURN 1 AS v UNION ALL RETURN 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 1 |

  Scenario: UNWIND a list from a property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {xs: [10, 20]})
      """
    When executing query:
      """
      MATCH (n:N) UNWIND n.xs AS x RETURN x
      """
    Then the result should be, in any order:
      | x  |
      | 10 |
      | 20 |

  Scenario: Parameters are visible in expressions
    Given any graph
    And parameters are:
      | p | 7 |
    When executing query:
      """
      RETURN $p + 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 8 |
