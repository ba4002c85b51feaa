# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: FunctionsDeep

  Scenario: duration component accessors
    Given any graph
    When executing query:
      """
      WITH duration({days: 3, hours: 26, minutes: 90}) AS d
      RETURN d.days AS days, d.hours AS hours, d.minutes AS minutes,
             d.minutesOfHour AS moh
      """
    Then the result should be, in any order:
      | days | hours | minutes | moh |
      | 3    | 27    | 1650    | 30  |

  Scenario: duration in seconds with nanosecond component
    Given any graph
    When executing query:
      """
      WITH duration({seconds: 90, milliseconds: 500}) AS d
      RETURN d.seconds AS s
      """
    Then the result should be, in any order:
      | s  |
      | 90 |

  Scenario: replace with empty search string is identity
    Given any graph
    When executing query:
      """
      RETURN replace('abc', 'zz', 'y') AS r
      """
    Then the result should be, in any order:
      | r     |
      | 'abc' |

  Scenario: split with a multi-character delimiter
    Given any graph
    When executing query:
      """
      RETURN split('a::b::c', '::') AS parts
      """
    Then the result should be, in any order:
      | parts           |
      | ['a', 'b', 'c'] |

  Scenario: left and right beyond the length clamp
    Given any graph
    When executing query:
      """
      RETURN left('ab', 10) AS l, right('ab', 10) AS r
      """
    Then the result should be, in any order:
      | l    | r    |
      | 'ab' | 'ab' |

  Scenario: EXISTS subquery with a WHERE clause inside
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:HAS {w: 5}]->(:Q)
      CREATE (:P {k: 2})-[:HAS {w: 50}]->(:Q)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.k AS k, EXISTS { MATCH (p)-[h:HAS]->() WHERE h.w > 10 } AS big
      """
    Then the result should be, in any order:
      | k | big   |
      | 1 | false |
      | 2 | true  |

  Scenario: exists function on a property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.v IS NOT NULL RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: type predicate expressions
    Given any graph
    When executing query:
      """
      RETURN 1 IS :: INTEGER AS a, 'x' IS :: STRING AS b,
             1.5 IS NOT :: INTEGER AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |

  Scenario: CASE with null subject falls to ELSE
    Given any graph
    When executing query:
      """
      WITH null AS x
      RETURN CASE x WHEN 1 THEN 'one' WHEN null THEN 'null!' ELSE 'other' END AS r
      """
    Then the result should be, in any order:
      | r       |
      | 'other' |

  Scenario: nested list comprehension
    Given any graph
    When executing query:
      """
      RETURN [x IN [1, 2] | [y IN [10, 20] | x * y]] AS m
      """
    Then the result should be, in any order:
      | m                        |
      | [[10, 20], [20, 40]]     |

  Scenario: reduce over collected values after aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N) WITH collect(n.v) AS vs
      RETURN reduce(acc = 1, x IN vs | acc * x) AS product
      """
    Then the result should be, in any order:
      | product |
      | 6       |

  Scenario: string comparison operators with null propagate
    Given any graph
    When executing query:
      """
      RETURN (null STARTS WITH 'a') IS NULL AS a,
             ('abc' CONTAINS null) IS NULL AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |
