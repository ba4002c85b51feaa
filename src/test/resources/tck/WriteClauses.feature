# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: WriteClauses

  Scenario: CREATE then MATCH in a later statement sees the node
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice'})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |

  Scenario: CREATE one node per incoming row
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3] AS i CREATE (:N {v: i})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS c, sum(n.v) AS s
      """
    Then the result should be, in any order:
      | c | s |
      | 3 | 6 |

  Scenario: CREATE and RETURN in the same statement
    Given an empty graph
    When executing query:
      """
      CREATE (n:N {v: 5}) RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 5 |

  Scenario: MERGE matches an existing node instead of creating
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    And having executed:
      """
      MERGE (:P {k: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: MERGE creates when no match exists
    Given an empty graph
    And having executed:
      """
      MERGE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: MERGE ON CREATE SET and ON MATCH SET
    Given an empty graph
    And having executed:
      """
      MERGE (p:P {k: 1}) ON CREATE SET p.src = 'created'
      """
    And having executed:
      """
      MERGE (p:P {k: 1}) ON MATCH SET p.seen = true
      """
    When executing query:
      """
      MATCH (p:P {k: 1}) RETURN p.src AS src, p.seen AS seen
      """
    Then the result should be, in any order:
      | src       | seen |
      | 'created' | true |

  Scenario: SET adds and overwrites a property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1})
      """
    And having executed:
      """
      MATCH (n:N) SET n.v = 2, n.w = 'new'
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v, n.w AS w
      """
    Then the result should be, in any order:
      | v | w     |
      | 2 | 'new' |

  Scenario: REMOVE deletes a property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1, w: 2})
      """
    And having executed:
      """
      MATCH (n:N) REMOVE n.w
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v, n.w AS w
      """
    Then the result should be, in any order:
      | v | w    |
      | 1 | null |

  Scenario: DELETE a relationship keeps its endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    And having executed:
      """
      MATCH ()-[r:R]->() DELETE r
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: DETACH DELETE removes the node and its relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    And having executed:
      """
      MATCH (a:A) DETACH DELETE a
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 1     |

  Scenario: RETURN after SET observes the updated property value
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1})
      """
    When executing query:
      """
      MATCH (n:N) SET n.v = 2 RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: RETURN after REMOVE observes the removed property as null
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1})
      """
    When executing query:
      """
      MATCH (n:N) REMOVE n.v RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: SET a label on an existing node
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})
      """
    And having executed:
      """
      MATCH (n:N) SET n:Extra
      """
    When executing query:
      """
      MATCH (n:Extra) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: CREATE a relationship between nodes bound by MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) CREATE (a)-[:LINK {w: 9}]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:LINK]->(:B) RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 9 |
