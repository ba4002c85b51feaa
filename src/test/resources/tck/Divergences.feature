# Scenarios that pin DOCUMENTED divergences of graft from openCypher —
# each is denylisted in denylist.txt with its reason, mirroring the
# reference's per-engine TCK denylist mechanism.

Feature: Divergences

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
