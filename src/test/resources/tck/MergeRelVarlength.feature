# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: MergeRelVarlength

  Scenario: MERGE relationship between bound endpoints creates once
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]->(b)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: MERGE relationship with differing properties creates separately
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R {w: 1}]->(b)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R {w: 2}]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Var-length with min 0 includes the start node
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 0})-[:R]->(:E {k: 1})
      """
    When executing query:
      """
      MATCH (s:S)-[:R*0..1]->(x)
      RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 0 |
      | 1 |

  Scenario: Var-length relationship uniqueness prevents edge reuse
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R]->(b:N {k: 2})
      CREATE (b)-[:R]->(a)
      """
    When executing query:
      """
      MATCH (s:N {k: 1})-[:R*1..4]->(e)
      RETURN e.k AS k, count(*) AS paths
      """
    Then the result should be, in any order:
      | k | paths |
      | 2 | 1     |
      | 1 | 1     |

  Scenario: Undirected var-length does not backtrack over the same edge
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[:R*1..2]-(x)
      RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: Named var-length relationship list has the path length
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 0})-[:R {w: 1}]->(:M {k: 1})-[:R {w: 2}]->(:E {k: 2})
      """
    When executing query:
      """
      MATCH (:S)-[rs:R*2..2]->(:E)
      RETURN size(rs) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: OPTIONAL MATCH on a var-length pattern with no match
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 0})
      """
    When executing query:
      """
      MATCH (s:S) OPTIONAL MATCH (s)-[:R*1..2]->(x)
      RETURN s.k AS s, x.k AS x
      """
    Then the result should be, in any order:
      | s | x    |
      | 0 | null |

  Scenario: MERGE node after DELETE recreates it
    Given an empty graph
    And having executed:
      """
      CREATE (:T {k: 1})
      """
    And having executed:
      """
      MATCH (t:T) DELETE t
      """
    And having executed:
      """
      MERGE (:T {k: 1})
      """
    When executing query:
      """
      MATCH (t:T) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Multiple relationship types in a var-length pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 0})-[:X]->(:M {k: 1})-[:Y]->(:E {k: 2})
      """
    When executing query:
      """
      MATCH (:S)-[:X|Y*2..2]->(e)
      RETURN e.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: Self-loop matches a cycle of length one
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})
      CREATE (a)-[:R]->(a)
      """
    When executing query:
      """
      MATCH (n:N)-[:R]->(n)
      RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
