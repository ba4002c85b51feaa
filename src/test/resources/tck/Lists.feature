# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: Lists

  Scenario: Static list indexing, including negative indices
    Given any graph
    When executing query:
      """
      WITH [10, 20, 30] AS xs
      RETURN xs[0] AS first, xs[-1] AS last, xs[5] AS missing
      """
    Then the result should be, in any order:
      | first | last | missing |
      | 10    | 30   | null    |

  Scenario: List slicing
    Given any graph
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS xs
      RETURN xs[1..3] AS mid, xs[..2] AS head, xs[3..] AS tail
      """
    Then the result should be, in any order:
      | mid    | head   | tail   |
      | [2, 3] | [1, 2] | [4, 5] |

  Scenario: range with and without step
    Given any graph
    When executing query:
      """
      RETURN range(1, 3) AS a, range(0, 10, 5) AS b
      """
    Then the result should be, in any order:
      | a         | b          |
      | [1, 2, 3] | [0, 5, 10] |

  Scenario: head, last and tail
    Given any graph
    When executing query:
      """
      WITH [1, 2, 3] AS xs
      RETURN head(xs) AS h, last(xs) AS l, tail(xs) AS t
      """
    Then the result should be, in any order:
      | h | l | t      |
      | 1 | 3 | [2, 3] |

  Scenario: List comprehension with filter and map
    Given any graph
    When executing query:
      """
      RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS xs
      """
    Then the result should be, in any order:
      | xs       |
      | [20, 40] |

  Scenario: reduce folds left over the list
    Given any graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS total
      """
    Then the result should be, in any order:
      | total |
      | 6     |

  Scenario: Quantifiers all, any, none, single
    Given any graph
    When executing query:
      """
      WITH [1, 2, 3] AS xs
      RETURN all(x IN xs WHERE x > 0) AS a, any(x IN xs WHERE x > 2) AS b,
             none(x IN xs WHERE x > 5) AS c, single(x IN xs WHERE x = 2) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |

  Scenario: reverse of a list
    Given any graph
    When executing query:
      """
      RETURN reverse([1, 2, 3]) AS r
      """
    Then the result should be, in any order:
      | r         |
      | [3, 2, 1] |

  Scenario: List concatenation with +
    Given any graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS xs
      """
    Then the result should be, in any order:
      | xs        |
      | [1, 2, 3] |

  Scenario: IN over an empty list is false even for null
    Given any graph
    When executing query:
      """
      RETURN 3 IN [] AS a
      """
    Then the result should be, in any order:
      | a     |
      | false |

  Scenario: Map literal access by key
    Given any graph
    When executing query:
      """
      WITH {name: 'Alice', age: 30} AS m
      RETURN m.name AS n, m.age AS a
      """
    Then the result should be, in any order:
      | n       | a  |
      | 'Alice' | 30 |

  Scenario: size of a list property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {xs: [1, 2, 3, 4]})
      """
    When executing query:
      """
      MATCH (n:N) RETURN size(n.xs) AS n
      """
    Then the result should be, in any order:
      | n |
      | 4 |
