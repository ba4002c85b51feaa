# Formerly the home of denylisted divergences. Both divergences pinned in
# earlier iterations (RETURN-after-SET property staleness, labels()
# staleness after SET label) are FIXED — SET/REMOVE rehydrate the touched
# variables' property AND label columns, so the trailing RETURN observes
# post-update values. The scenarios stay here as regression pins; the
# denylist is empty until a genuine divergence appears.

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
