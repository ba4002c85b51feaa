# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: MixedSurface

  Scenario: head and last of an empty list are null
    Given any graph
    When executing query:
      """
      RETURN head([]) IS NULL AS h, last([]) IS NULL AS l
      """
    Then the result should be, in any order:
      | h    | l    |
      | true | true |

  Scenario: EXISTS subquery full form with MATCH and WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:H]->(:Q {v: 9})
      CREATE (:P {k: 2})-[:H]->(:Q {v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      WHERE EXISTS { MATCH (p)-[:H]->(q:Q) WHERE q.v > 5 }
      RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: isEmpty on lists strings and maps
    Given any graph
    When executing query:
      """
      RETURN isEmpty([]) AS el, isEmpty([1]) AS nl,
             isEmpty('') AS es, isEmpty('x') AS ns
      """
    Then the result should be, in any order:
      | el   | nl    | es   | ns    |
      | true | false | true | false |

  Scenario: string escape sequences in literals
    Given any graph
    When executing query:
      """
      RETURN size('a\nb') AS n, size('a\tb') AS t
      """
    Then the result should be, in any order:
      | n | t |
      | 3 | 3 |

  Scenario: float literals in scientific notation
    Given any graph
    When executing query:
      """
      RETURN 1e3 AS a, 2.5e-1 AS b
      """
    Then the result should be, in any order:
      | a      | b    |
      | 1000.0 | 0.25 |

  Scenario: hex and octal integer literals
    Given any graph
    When executing query:
      """
      RETURN 0xff AS h, 0o17 AS o
      """
    Then the result should be, in any order:
      | h   | o  |
      | 255 | 15 |

  Scenario: WITH aggregation then UNWIND the collected list
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) WITH collect(n.v) AS vs
      UNWIND vs AS v
      RETURN v * 10 AS w
      """
    Then the result should be, in any order:
      | w  |
      | 10 |
      | 20 |

  Scenario: list IN list membership is by deep equality
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[1, 2], [3]] AS a, [1] IN [[2]] AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: nested property chain through a map of maps
    Given any graph
    When executing query:
      """
      WITH {outer: {inner: 7}} AS m
      RETURN m.outer.inner AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |

  Scenario: comparison chains through WITH aliases preserve types
    Given any graph
    When executing query:
      """
      WITH 2 AS two, 2.0 AS twoF
      RETURN two = twoF AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |

  Scenario: ORDER BY expression over two columns
    Given an empty graph
    And having executed:
      """
      CREATE (:N {a: 1, b: 9}), (:N {a: 5, b: 2}), (:N {a: 3, b: 3})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.a AS a ORDER BY n.a + n.b DESC
      """
    Then the result should be, in order:
      | a |
      | 1 |
      | 5 |
      | 3 |
