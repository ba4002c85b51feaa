# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: SpatialLabelsDynamic

  Scenario: cartesian point distance
    Given any graph
    When executing query:
      """
      WITH point({x: 0, y: 0}) AS a, point({x: 3, y: 4}) AS b
      RETURN point.distance(a, b) AS d
      """
    Then the result should be, in any order:
      | d   |
      | 5.0 |

  Scenario: point coordinate accessors
    Given any graph
    When executing query:
      """
      WITH point({x: 1.5, y: 2.5}) AS p
      RETURN p.x AS x, p.y AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 1.5 | 2.5 |

  Scenario: label disjunction expression
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2}), (:C {k: 3})
      """
    When executing query:
      """
      MATCH (n:A|B) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
      | 2 |

  Scenario: negated label expression
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    When executing query:
      """
      MATCH (n:!A) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: label conjunction with ampersand
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {k: 1}), (:A {k: 2})
      """
    When executing query:
      """
      MATCH (n:A&B) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: dynamic property access with a parameter key
    Given an empty graph
    And having executed:
      """
      CREATE (:N {score: 42})
      """
    And parameters are:
      | key | 'score' |
    When executing query:
      """
      MATCH (n:N) RETURN n[$key] AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: normalize applies NFC by default
    Given any graph
    When executing query:
      """
      RETURN normalize('café') = 'café' AS same
      """
    Then the result should be, in any order:
      | same |
      | true |

  Scenario: COLLECT subquery gathers ordered values
    Given an empty graph
    And having executed:
      """
      CREATE (:R {name: 'west'})
      CREATE (:City {v: 3}), (:City {v: 1}), (:City {v: 2})
      """
    When executing query:
      """
      MATCH (r:R)
      RETURN r.name AS name,
             COLLECT { MATCH (c:City) RETURN c.v ORDER BY c.v } AS vs
      """
    Then the result should be, in any order:
      | name   | vs        |
      | 'west' | [1, 2, 3] |

  Scenario: SKIP and LIMIT accept parameter expressions
    Given any graph
    And parameters are:
      | s | 1 |
      | l | 2 |
    When executing query:
      """
      UNWIND [10, 20, 30, 40] AS x
      RETURN x ORDER BY x SKIP $s LIMIT $l
      """
    Then the result should be, in order:
      | x  |
      | 20 |
      | 30 |

  Scenario: CALL subquery with UNION body
    Given an empty graph
    When executing query:
      """
      CALL { RETURN 1 AS v UNION ALL RETURN 2 AS v }
      RETURN sum(v) AS s
      """
    Then the result should be, in any order:
      | s |
      | 3 |

  Scenario: Uncorrelated EXISTS in WHERE gates every row
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:N {k: 2}), (:Marker)
      """
    When executing query:
      """
      MATCH (n:N) WHERE EXISTS { MATCH (:Marker) }
      RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
      | 2 |

  Scenario: Uncorrelated NOT EXISTS drops every row when matched
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:Marker)
      """
    When executing query:
      """
      MATCH (n:N) WHERE NOT EXISTS { MATCH (:Marker) }
      RETURN n.k AS k
      """
    Then the result should be empty

  Scenario: Uncorrelated COUNT subquery in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:Z), (:Z), (:Z)
      """
    When executing query:
      """
      UNWIND [1, 2] AS x
      RETURN x, COUNT { MATCH (:Z) } AS n
      """
    Then the result should be, in any order:
      | x | n |
      | 1 | 3 |
      | 2 | 3 |
