# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: OptionalWithSemantics

  Scenario: WHERE attached to OPTIONAL MATCH filters inside the optional
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {v: 5})
      CREATE (:A {k: 2})-[:R]->(:B {v: 99})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B) WHERE b.v < 10
      RETURN a.k AS k, b.v AS v
      """
    Then the result should be, in any order:
      | k | v    |
      | 1 | 5    |
      | 2 | null |

  Scenario: WHERE after WITH filters the pipeline instead
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {v: 5})
      CREATE (:A {k: 2})-[:R]->(:B {v: 99})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      WITH a, b WHERE b.v < 10
      RETURN a.k AS k, b.v AS v
      """
    Then the result should be, in any order:
      | k | v |
      | 1 | 5 |

  Scenario: MATCH after OPTIONAL MATCH drops rows with null anchors
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 10})-[:S]->(:C {k: 100})
      CREATE (:A {k: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      MATCH (b)-[:S]->(c:C)
      RETURN a.k AS a, c.k AS c
      """
    Then the result should be, in any order:
      | a | c   |
      | 1 | 100 |

  Scenario: WITH star carries every binding forward
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1, y: 2})
      """
    When executing query:
      """
      MATCH (n:N)
      WITH *, n.x + n.y AS s
      RETURN n.x AS x, s
      """
    Then the result should be, in any order:
      | x | s |
      | 1 | 3 |

  Scenario: Aggregation groups by every non-aggregate projection
    Given an empty graph
    And having executed:
      """
      CREATE (:E {d: 'a', t: 'x', v: 1}), (:E {d: 'a', t: 'x', v: 2}),
             (:E {d: 'a', t: 'y', v: 4}), (:E {d: 'b', t: 'x', v: 8})
      """
    When executing query:
      """
      MATCH (e:E)
      RETURN e.d AS d, e.t AS t, sum(e.v) AS s
      """
    Then the result should be, in any order:
      | d   | t   | s |
      | 'a' | 'x' | 3 |
      | 'a' | 'y' | 4 |
      | 'b' | 'x' | 8 |

  Scenario: ORDER BY an aggregate alias
    Given an empty graph
    And having executed:
      """
      CREATE (:E {g: 'a'}), (:E {g: 'a'}), (:E {g: 'b'}),
             (:E {g: 'c'}), (:E {g: 'c'}), (:E {g: 'c'})
      """
    When executing query:
      """
      MATCH (e:E)
      RETURN e.g AS g, count(*) AS c ORDER BY c DESC, g LIMIT 2
      """
    Then the result should be, in order:
      | g   | c |
      | 'c' | 3 |
      | 'a' | 2 |

  Scenario: OPTIONAL MATCH on a disconnected pattern yields a row per combination
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (z:Z)
      RETURN a.k AS a, z.k AS z
      """
    Then the result should be, in any order:
      | a | z    |
      | 1 | null |

  Scenario: Standalone OPTIONAL MATCH on an empty label
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (z:Z)
      RETURN z.k AS k
      """
    Then the result should be, in any order:
      | k    |
      | null |

  Scenario: Multiple comma patterns in one MATCH share bindings
    Given an empty graph
    And having executed:
      """
      CREATE (a:H {k: 1})-[:X]->(b:M {k: 2})
      CREATE (b)-[:Y]->(:T {k: 3})
      """
    When executing query:
      """
      MATCH (a:H)-[:X]->(m), (m)-[:Y]->(t)
      RETURN a.k AS a, m.k AS m, t.k AS t
      """
    Then the result should be, in any order:
      | a | m | t |
      | 1 | 2 | 3 |
