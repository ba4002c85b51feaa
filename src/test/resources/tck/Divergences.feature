# Scenarios that pin DOCUMENTED divergences of graft from openCypher —
# each is denylisted in denylist.txt with its reason, mirroring the
# reference's per-engine TCK denylist mechanism.

Feature: Divergences

  Scenario: labels read after SET label in the same statement sees the new label
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})
      """
    When executing query:
      """
      MATCH (n:N) SET n:Extra RETURN size(labels(n)) AS nl
      """
    Then the result should be, in any order:
      | nl |
      | 2  |
