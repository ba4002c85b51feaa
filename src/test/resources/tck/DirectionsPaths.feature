# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: DirectionsPaths

  Scenario: Left-pointing relationship pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    When executing query:
      """
      MATCH (b:B)<-[:R]-(a:A)
      RETURN a.k AS a, b.k AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 1 | 2 |

  Scenario: CREATE with a left-pointing relationship
    Given an empty graph
    When executing query:
      """
      CREATE (a:A {k: 1})<-[:R]-(b:B {k: 2})
      RETURN a.k AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |

  Scenario: CREATE left-pointing stores the correct direction
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})<-[:R]-(:B {k: 2})
      """
    When executing query:
      """
      MATCH (src)-[:R]->(dst)
      RETURN src.k AS src, dst.k AS dst
      """
    Then the result should be, in any order:
      | src | dst |
      | 2   | 1   |

  Scenario: allShortestPaths returns every minimal-length tie
    Given an empty graph
    And having executed:
      """
      CREATE (a:S {k: 0}), (d:E {k: 3})
      CREATE (a)-[:R]->(:M {k: 1})-[:R]->(d)
      CREATE (a)-[:R]->(:M {k: 2})-[:R]->(d)
      """
    When executing query:
      """
      MATCH (s:S), (e:E)
      MATCH p = allShortestPaths((s)-[:R*..4]->(e))
      RETURN length(p) AS len, count(*) AS n
      """
    Then the result should be, in any order:
      | len | n |
      | 2   | 2 |

  Scenario: Mixed-direction two-hop pattern
    Given an empty graph
    And having executed:
      """
      CREATE (m:M {k: 2})
      CREATE (:A {k: 1})-[:R]->(m)
      CREATE (:C {k: 3})-[:S]->(m)
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(m)<-[:S]-(c:C)
      RETURN a.k AS a, m.k AS m, c.k AS c
      """
    Then the result should be, in any order:
      | a | m | c |
      | 1 | 2 | 3 |

  Scenario: Undirected one-hop does not duplicate the self pair
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:A {k: 2})
      """
    When executing query:
      """
      MATCH (x:A)-[:R]-(y:A)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Zero-hop variable-length binds the start as the end
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 7})
      """
    When executing query:
      """
      MATCH (s:S)-[:R*0..0]->(x)
      RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 7 |

  Scenario: Long CREATE chain round-trips
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:N]->(:P {k: 2})-[:N]->(:P {k: 3})-[:N]->(:P {k: 4})
      """
    When executing query:
      """
      MATCH p = (:P {k: 1})-[:N*3..3]->(:P {k: 4})
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 3   |

  Scenario: Two patterns in CREATE separated by comma
    Given an empty graph
    When executing query:
      """
      CREATE (:X {k: 1}), (:Y {k: 2})-[:R]->(:Z {k: 3})
      RETURN 1 AS ok
      """
    Then the result should be, in any order:
      | ok |
      | 1  |
