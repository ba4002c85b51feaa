# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: WriteErrors

  Scenario: Deleting a node with relationships raises an error
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    When executing query:
      """
      MATCH (a:A) DELETE a
      """
    Then a ConstraintValidationFailed should be raised at runtime

  Scenario: CREATE with a bound variable re-specifying labels is an error
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A) CREATE (a:B)
      """
    Then a SyntaxError should be raised at compile time

  Scenario: CREATE a longer pattern in one clause
    Given an empty graph
    And having executed:
      """
      CREATE (:X {k: 1})-[:R1]->(:Y {k: 2})-[:R2]->(:Z {k: 3})
      """
    When executing query:
      """
      MATCH (x:X)-[:R1]->(y:Y)-[:R2]->(z:Z)
      RETURN x.k AS x, y.k AS y, z.k AS z
      """
    Then the result should be, in any order:
      | x | y | z |
      | 1 | 2 | 3 |

  Scenario: UNWIND then CREATE then aggregate in one statement
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 4) AS i
      CREATE (n:G {v: i * i})
      RETURN sum(n.v) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 30 |

  Scenario: MERGE undirected relationship matches either orientation
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1}), (b:B {k: 2})
      CREATE (b)-[:R]->(a)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]-(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]-() RETURN count(DISTINCT r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Undirected MERGE over a symmetric row set creates one relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1}), (:P {k: 2})
      """
    And having executed:
      """
      MATCH (a:P), (b:P) WHERE a.k <> b.k MERGE (a)-[:T]-(b)
      """
    When executing query:
      """
      MATCH ()-[r:T]->() RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: sum and avg honor DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 5}), (:N {v: 5}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN sum(DISTINCT n.v) AS s, avg(DISTINCT n.v) AS a
      """
    Then the result should be, in any order:
      | s | a   |
      | 8 | 4.0 |

  Scenario: SET with CASE expression value
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 10})
      """
    And having executed:
      """
      MATCH (n:N) SET n.size = CASE WHEN n.v < 5 THEN 'small' ELSE 'big' END
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v, n.size AS size
      """
    Then the result should be, in any order:
      | v  | size    |
      | 1  | 'small' |
      | 10 | 'big'   |

  Scenario: REMOVE a label keeps the other labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {k: 1})
      """
    And having executed:
      """
      MATCH (n:A) REMOVE n:B
      """
    When executing query:
      """
      MATCH (n:A) RETURN size(labels(n)) AS nl
      """
    Then the result should be, in any order:
      | nl |
      | 1  |

  Scenario: DELETE null is a no-op
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b) DELETE b
      RETURN a.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: Property set to null removes it
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1})
      """
    And having executed:
      """
      MATCH (n:N) SET n.v = null
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v IS NULL AS gone
      """
    Then the result should be, in any order:
      | gone |
      | true |
