# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: OptionalMatchNull

  Scenario: OPTIONAL MATCH with no match produces a null row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b)
      RETURN a.k AS a, b.k AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 1 | null |

  Scenario: OPTIONAL MATCH keeps matched rows intact
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1})-[:R]->(:B {k: 2})
      CREATE (:A {k: 3})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.k AS a, b.k AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 1 | 2    |
      | 3 | null |

  Scenario: Ternary logic of equality with null
    Given any graph
    When executing query:
      """
      RETURN (null = 1) IS NULL AS eq, (null <> 1) IS NULL AS ne,
             (null = null) IS NULL AS nn
      """
    Then the result should be, in any order:
      | eq   | ne   | nn   |
      | true | true | true |

  Scenario: AND OR ternary truth table highlights
    Given any graph
    When executing query:
      """
      RETURN (true OR null) AS a, (false AND null) AS b,
             (false OR null) IS NULL AS c, (true AND null) IS NULL AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    |
      | true | false | true | true |

  Scenario: NOT null is null
    Given any graph
    When executing query:
      """
      RETURN (NOT null) IS NULL AS x
      """
    Then the result should be, in any order:
      | x    |
      | true |

  Scenario: Property of null is null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b)
      RETURN b.missing IS NULL AS isnull
      """
    Then the result should be, in any order:
      | isnull |
      | true   |

  Scenario: Arithmetic with null is null
    Given any graph
    When executing query:
      """
      RETURN (1 + null) IS NULL AS a, (null * 2) IS NULL AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |
