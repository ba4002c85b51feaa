# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: ErrorsAndEdges

  Scenario: Unmatched parenthesis is a syntax error
    Given any graph
    When executing query:
      """
      MATCH (n:A RETURN n.k AS k
      """
    Then a SyntaxError should be raised at compile time

  Scenario: Unknown function is rejected
    Given any graph
    When executing query:
      """
      RETURN definitelyNotAFunction(1) AS x
      """
    Then a SyntaxError should be raised at compile time

  Scenario: round ties go toward positive infinity
    Given any graph
    When executing query:
      """
      RETURN round(2.5) AS a, round(-2.5) AS b, round(-2.6) AS c
      """
    Then the result should be, in any order:
      | a   | b    | c    |
      | 3.0 | -2.0 | -3.0 |

  Scenario: round with precision uses HALF_UP
    Given any graph
    When executing query:
      """
      RETURN round(1.249, 1) AS a, round(-1.25, 1) AS b
      """
    Then the result should be, in any order:
      | a   | b    |
      | 1.2 | -1.3 |

  Scenario: toInteger truncates floats toward zero
    Given any graph
    When executing query:
      """
      RETURN toInteger(3.9) AS a, toInteger(-3.9) AS b
      """
    Then the result should be, in any order:
      | a | b  |
      | 3 | -3 |

  Scenario: Slices clamp to list bounds
    Given any graph
    When executing query:
      """
      WITH [1, 2, 3] AS xs
      RETURN xs[1..100] AS tail, xs[-2..] AS lastTwo
      """
    Then the result should be, in any order:
      | tail   | lastTwo |
      | [2, 3] | [2, 3]  |

  Scenario: substring beyond the end clamps to empty
    Given any graph
    When executing query:
      """
      RETURN substring('abc', 5) AS s
      """
    Then the result should be, in any order:
      | s  |
      | '' |

  Scenario: String functions propagate null
    Given any graph
    When executing query:
      """
      RETURN toUpper(null) IS NULL AS a, split(null, ',') IS NULL AS b,
             size(null) IS NULL AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |

  Scenario: Accessing a property on a scalar raises an error
    Given any graph
    When executing query:
      """
      WITH 1 AS x RETURN x.prop AS p
      """
    Then a TypeError should be raised at runtime

  Scenario: DISTINCT aggregation interacts with grouping keys
    Given an empty graph
    And having executed:
      """
      CREATE (:N {g: 'a', v: 1}), (:N {g: 'a', v: 1}), (:N {g: 'a', v: 2}),
             (:N {g: 'b', v: 1})
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN n.g AS g, count(DISTINCT n.v) AS c
      """
    Then the result should be, in any order:
      | g   | c |
      | 'a' | 2 |
      | 'b' | 1 |

  Scenario: Double LIMIT across WITH stages composes
    Given any graph
    When executing query:
      """
      UNWIND range(1, 10) AS x
      WITH x ORDER BY x LIMIT 5
      WITH x ORDER BY x DESC LIMIT 2
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 4 |
      | 5 |

  Scenario: Integer overflow in addition raises an error
    Given any graph
    When executing query:
      """
      RETURN 9223372036854775807 + 1 AS x
      """
    Then an ArithmeticError should be raised at runtime
