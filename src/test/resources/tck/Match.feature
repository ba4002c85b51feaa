# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: Match

  Scenario: Match all nodes of a label and project a property
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice', age: 30}),
             (:Person {name: 'Bob', age: 25}),
             (:Animal {name: 'Rex'})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
      | 'Bob'   |

  Scenario: Match on inline property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice', age: 30}),
             (:Person {name: 'Bob', age: 25})
      """
    When executing query:
      """
      MATCH (p:Person {age: 25}) RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Bob' |

  Scenario: Match a directed relationship pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Alice'})-[:KNOWS]->(b:Person {name: 'Bob'})
      CREATE (b)-[:KNOWS]->(:Person {name: 'Carol'})
      """
    When executing query:
      """
      MATCH (x:Person)-[:KNOWS]->(y:Person)
      RETURN x.name AS src, y.name AS dst
      """
    Then the result should be, in any order:
      | src     | dst     |
      | 'Alice' | 'Bob'   |
      | 'Bob'   | 'Carol' |

  Scenario: Match an undirected relationship matches both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})-[:T]->(:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (x:P)-[:T]-(y:P) RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'b' |
      | 'b' | 'a' |

  Scenario: Match with relationship type alternation
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:X]->(:N {k: 2})
      CREATE (a)-[:Y]->(:N {k: 3})
      CREATE (a)-[:Z]->(:N {k: 4})
      """
    When executing query:
      """
      MATCH (:N {k: 1})-[:X|Y]->(m) RETURN m.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |
      | 3 |

  Scenario: Match a two-hop path
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})-[:R]->(:C {k: 3})
      """
    When executing query:
      """
      MATCH (a)-[:R]->()-[:R]->(c) RETURN a.k AS a, c.k AS c
      """
    Then the result should be, in any order:
      | a | c |
      | 1 | 3 |

  Scenario: Variable-length path returns each reachable node once per path
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 0})-[:R]->(:M {k: 1})-[:R]->(:E {k: 2})
      """
    When executing query:
      """
      MATCH (:S)-[:R*1..2]->(x) RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
      | 2 |

  Scenario: Match with relationship property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R {w: 5}]->(:N {k: 2})
      CREATE (:N {k: 3})-[:R {w: 9}]->(:N {k: 4})
      """
    When executing query:
      """
      MATCH (a)-[r:R]->(b) WHERE r.w > 6 RETURN a.k AS a, b.k AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 3 | 4 |

  Scenario: Match nothing on an empty graph
    Given an empty graph
    When executing query:
      """
      MATCH (n:Missing) RETURN n.k AS k
      """
    Then the result should be empty

  Scenario: Matching a relationship variable and reading its type
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:LIKES]->(:N {k: 2})
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t
      """
    Then the result should be, in any order:
      | t       |
      | 'LIKES' |

  Scenario: Node with multiple labels matches each label predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {k: 1}), (:A {k: 2}), (:B {k: 3})
      """
    When executing query:
      """
      MATCH (n:A:B) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: Cartesian product of two disconnected patterns
    Given an empty graph
    And having executed:
      """
      CREATE (:X {k: 1}), (:X {k: 2}), (:Y {k: 10})
      """
    When executing query:
      """
      MATCH (x:X), (y:Y) RETURN x.k AS x, y.k AS y
      """
    Then the result should be, in any order:
      | x | y  |
      | 1 | 10 |
      | 2 | 10 |
