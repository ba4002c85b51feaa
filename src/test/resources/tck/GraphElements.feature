# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: GraphElements

  Scenario: startNode and endNode properties of a relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    When executing query:
      """
      MATCH ()-[r:R]->()
      RETURN startNode(r).k AS s, endNode(r).k AS e
      """
    Then the result should be, in any order:
      | s | e |
      | 1 | 2 |

  Scenario: Map projection with literal extras
    Given an empty graph
    And having executed:
      """
      CREATE (:N {a: 1, b: 2})
      """
    When executing query:
      """
      MATCH (n:N) WITH n{.a, extra: 42} AS m
      RETURN m.a AS a, m.extra AS extra
      """
    Then the result should be, in any order:
      | a | extra |
      | 1 | 42    |

  Scenario: properties of a relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R {w: 7, tag: 'x'}]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() WITH properties(r) AS p
      RETURN p.w AS w, p.tag AS tag
      """
    Then the result should be, in any order:
      | w | tag |
      | 7 | 'x' |

  Scenario: COUNT subquery with undirected shorthand pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {k: 1})-[:X]->(:Q)
      CREATE (:Q)-[:Y]->(a)
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.k AS k, COUNT { (p)--() } AS degree
      """
    Then the result should be, in any order:
      | k | degree |
      | 1 | 2      |
      | 2 | 0      |

  Scenario: id function is stable within a statement
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})
      """
    When executing query:
      """
      MATCH (n:N) RETURN id(n) = id(n) AS same
      """
    Then the result should be, in any order:
      | same |
      | true |

  Scenario: type and labels functions null-propagate through OPTIONAL MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[r:R]->(b)
      RETURN type(r) IS NULL AS tn, labels(b) IS NULL AS lb
      """
    Then the result should be, in any order:
      | tn   | lb   |
      | true | true |

  Scenario: degree via size of a pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:H {k: 1})
      CREATE (a)-[:R]->(:T), (a)-[:R]->(:T), (a)-[:R]->(:T)
      """
    When executing query:
      """
      MATCH (h:H)
      RETURN size([(h)-[:R]->() | 1]) AS deg
      """
    Then the result should be, in any order:
      | deg |
      | 3   |
