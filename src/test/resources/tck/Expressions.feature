# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: Expressions

  Scenario: Arithmetic precedence and mixed int-float widening
    Given any graph
    When executing query:
      """
      RETURN 2 + 3 * 4 AS a, 1 + 1.5 AS b, 7 % 3 AS c
      """
    Then the result should be, in any order:
      | a  | b   | c |
      | 14 | 2.5 | 1 |

  Scenario: Unary minus and subtraction
    Given any graph
    When executing query:
      """
      WITH 5 AS x RETURN -x AS neg, 10 - x AS diff
      """
    Then the result should be, in any order:
      | neg | diff |
      | -5  | 5    |

  Scenario: String concatenation with +
    Given any graph
    When executing query:
      """
      RETURN 'foo' + 'bar' AS s
      """
    Then the result should be, in any order:
      | s        |
      | 'foobar' |

  Scenario: Generic CASE picks the first true branch
    Given any graph
    When executing query:
      """
      WITH 7 AS x
      RETURN CASE WHEN x < 5 THEN 'small' WHEN x < 10 THEN 'mid' ELSE 'big' END AS b
      """
    Then the result should be, in any order:
      | b     |
      | 'mid' |

  Scenario: Simple CASE compares the operand
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      RETURN x, CASE x WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w
      """
    Then the result should be, in any order:
      | x | w      |
      | 1 | 'one'  |
      | 2 | 'two'  |
      | 3 | 'many' |

  Scenario: CASE without ELSE yields null
    Given any graph
    When executing query:
      """
      WITH 9 AS x
      RETURN CASE WHEN x < 5 THEN 'small' END AS b
      """
    Then the result should be, in any order:
      | b    |
      | null |

  Scenario: coalesce returns the first non-null argument
    Given any graph
    When executing query:
      """
      RETURN coalesce(null, null, 3, 4) AS v
      """
    Then the result should be, in any order:
      | v |
      | 3 |

  Scenario: String functions
    Given any graph
    When executing query:
      """
      RETURN toUpper('abc') AS up, toLower('ABC') AS low,
             trim('  x  ') AS t, replace('banana', 'na', 'NA') AS r,
             substring('hello', 1, 3) AS sub, reverse('abc') AS rev,
             left('hello', 2) AS l, right('hello', 2) AS rr
      """
    Then the result should be, in any order:
      | up    | low   | t   | r        | sub   | rev   | l    | rr   |
      | 'ABC' | 'abc' | 'x' | 'baNANA' | 'ell' | 'cba' | 'he' | 'lo' |

  Scenario: split and size
    Given any graph
    When executing query:
      """
      RETURN split('a,b,c', ',') AS parts, size(split('a,b,c', ',')) AS n
      """
    Then the result should be, in any order:
      | parts           | n |
      | ['a', 'b', 'c'] | 3 |

  Scenario: toString of numbers and booleans
    Given any graph
    When executing query:
      """
      RETURN toString(7) AS i, toString(true) AS b
      """
    Then the result should be, in any order:
      | i   | b      |
      | '7' | 'true' |

  Scenario: toInteger and toFloat conversions
    Given any graph
    When executing query:
      """
      RETURN toInteger('42') AS i, toFloat('2.5') AS f, toInteger('nope') AS bad
      """
    Then the result should be, in any order:
      | i  | f   | bad  |
      | 42 | 2.5 | null |

  Scenario: abs, sign and rounding functions
    Given any graph
    When executing query:
      """
      RETURN abs(-3) AS a, sign(-2) AS s, round(2.5) AS r,
             floor(2.9) AS fl, ceil(2.1) AS ce
      """
    Then the result should be, in any order:
      | a | s  | r   | fl  | ce  |
      | 3 | -1 | 3.0 | 2.0 | 3.0 |

  Scenario: Boolean operators with NOT and XOR
    Given any graph
    When executing query:
      """
      RETURN NOT true AS n, true XOR false AS x, true XOR true AS y
      """
    Then the result should be, in any order:
      | n     | x    | y     |
      | false | true | false |

  Scenario: size of a string is its character length
    Given any graph
    When executing query:
      """
      RETURN size('hello') AS n
      """
    Then the result should be, in any order:
      | n |
      | 5 |
