# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: EdgeSemantics

  Scenario: Integer division truncates, float division does not
    Given any graph
    When executing query:
      """
      RETURN 3 / 2 AS intdiv, 3.0 / 2 AS floatdiv
      """
    Then the result should be, in any order:
      | intdiv | floatdiv |
      | 1      | 1.5      |

  Scenario: Exponentiation returns a float
    Given any graph
    When executing query:
      """
      RETURN 2 ^ 3 AS p
      """
    Then the result should be, in any order:
      | p   |
      | 8.0 |

  Scenario: IN with null element yields null when no match is proven
    Given any graph
    When executing query:
      """
      RETURN (3 IN [1, null]) IS NULL AS unproven, 1 IN [1, null] AS proven
      """
    Then the result should be, in any order:
      | unproven | proven |
      | true     | true   |

  Scenario: null IN a non-empty list is null
    Given any graph
    When executing query:
      """
      RETURN (null IN [1, 2]) IS NULL AS a, null IN [] AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: Equality between lists is element-wise
    Given any graph
    When executing query:
      """
      RETURN [1, 2] = [1, 2] AS eq, [1, 2] = [1, 3] AS ne
      """
    Then the result should be, in any order:
      | eq   | ne    |
      | true | false |

  Scenario: String comparison is lexicographic
    Given any graph
    When executing query:
      """
      RETURN 'apple' < 'banana' AS a, 'b' < 'ba' AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: Chained comparison operators
    Given any graph
    When executing query:
      """
      RETURN 1 < 2 AND 2 < 3 AS t
      """
    Then the result should be, in any order:
      | t    |
      | true |

  Scenario: labels function returns the node labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {k: 1})
      """
    When executing query:
      """
      MATCH (n {k: 1}) UNWIND labels(n) AS l RETURN l ORDER BY l
      """
    Then the result should be, in order:
      | l   |
      | 'A' |
      | 'B' |

  Scenario: properties function returns the property map
    Given an empty graph
    And having executed:
      """
      CREATE (:N {a: 1, b: 2})
      """
    When executing query:
      """
      MATCH (n:N) WITH properties(n) AS m
      RETURN m.a AS a, m.b AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 1 | 2 |

  Scenario: keys of a node lists its property names
    Given an empty graph
    And having executed:
      """
      CREATE (:N {a: 1, b: 2})
      """
    When executing query:
      """
      MATCH (n:N) UNWIND keys(n) AS k RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |

  Scenario: Map projection with property selectors
    Given an empty graph
    And having executed:
      """
      CREATE (:N {a: 1, b: 2, c: 3})
      """
    When executing query:
      """
      MATCH (n:N) WITH n{.a, .c} AS m
      RETURN m.a AS a, m.c AS c
      """
    Then the result should be, in any order:
      | a | c |
      | 1 | 3 |

  Scenario: Accessing a missing key of a literal map is null
    Given any graph
    When executing query:
      """
      WITH {a: 1} AS m RETURN m.missing IS NULL AS isnull
      """
    Then the result should be, in any order:
      | isnull |
      | true   |

  Scenario: Division by zero raises an error
    Given any graph
    When executing query:
      """
      RETURN 1 / 0 AS x
      """
    Then a ArithmeticError should be raised at runtime

  Scenario: Ordering booleans sorts false before true
    Given any graph
    When executing query:
      """
      UNWIND [true, false, true] AS b RETURN b ORDER BY b
      """
    Then the result should be, in order:
      | b     |
      | false |
      | true  |
      | true  |

  Scenario: DISTINCT on lists compares by value
    Given any graph
    When executing query:
      """
      UNWIND [[1, 2], [1, 2], [2, 1]] AS xs
      RETURN DISTINCT xs
      """
    Then the result should be, in any order:
      | xs     |
      | [1, 2] |
      | [2, 1] |

  Scenario: WITH carrying an alias shadows nothing downstream
    Given any graph
    When executing query:
      """
      WITH 1 AS x WITH x, x + 1 AS y RETURN x, y
      """
    Then the result should be, in any order:
      | x | y |
      | 1 | 2 |

  Scenario: toBoolean conversions
    Given any graph
    When executing query:
      """
      RETURN toBoolean('true') AS t, toBoolean('false') AS f,
             toBoolean('nope') AS bad
      """
    Then the result should be, in any order:
      | t    | f     | bad  |
      | true | false | null |

  Scenario: e and pi are available with known prefixes
    Given any graph
    When executing query:
      """
      RETURN floor(pi()) AS p, floor(e()) AS ee
      """
    Then the result should be, in any order:
      | p   | ee  |
      | 3.0 | 2.0 |
