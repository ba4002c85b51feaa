# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: Aggregation

  Scenario: count(*) counts rows, count(expr) skips nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS rows, count(n.v) AS vals
      """
    Then the result should be, in any order:
      | rows | vals |
      | 3    | 2    |

  Scenario: Grouped aggregation keys on the non-aggregated columns
    Given an empty graph
    And having executed:
      """
      CREATE (:P {dept: 'a', sal: 10}), (:P {dept: 'a', sal: 20}),
             (:P {dept: 'b', sal: 5})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.dept AS dept, sum(p.sal) AS total
      """
    Then the result should be, in any order:
      | dept | total |
      | 'a'  | 30    |
      | 'b'  | 5     |

  Scenario: min and max over integers
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 5}), (:N {v: 3}), (:N {v: 9})
      """
    When executing query:
      """
      MATCH (n:N) RETURN min(n.v) AS lo, max(n.v) AS hi
      """
    Then the result should be, in any order:
      | lo | hi |
      | 3  | 9  |

  Scenario: avg over integers returns a float
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN avg(n.v) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 1.5 |

  Scenario: collect gathers values and skips nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 2}), (:N {v: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WITH n.v AS v ORDER BY v RETURN collect(v) AS vs
      """
    Then the result should be, in any order:
      | vs     |
      | [1, 2] |

  Scenario: count on zero matched rows is zero
    Given an empty graph
    When executing query:
      """
      MATCH (n:Missing) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: collect on zero matched rows is the empty list
    Given an empty graph
    When executing query:
      """
      MATCH (n:Missing) RETURN collect(n.v) AS vs
      """
    Then the result should be, in any order:
      | vs |
      | [] |

  Scenario: count DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(DISTINCT n.v) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: min and max over strings use string order
    Given an empty graph
    And having executed:
      """
      CREATE (:N {s: 'pear'}), (:N {s: 'apple'}), (:N {s: 'fig'})
      """
    When executing query:
      """
      MATCH (n:N) RETURN min(n.s) AS lo, max(n.s) AS hi
      """
    Then the result should be, in any order:
      | lo      | hi     |
      | 'apple' | 'pear' |

  Scenario: Aggregation inside WITH then filter on the aggregate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {dept: 'a'}), (:P {dept: 'a'}), (:P {dept: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.dept AS dept, count(*) AS c WHERE c > 1
      RETURN dept, c
      """
    Then the result should be, in any order:
      | dept | c |
      | 'a'  | 2 |

  Scenario: sum over no rows is zero
    Given an empty graph
    When executing query:
      """
      MATCH (n:Missing) RETURN sum(n.v) AS s
      """
    Then the result should be, in any order:
      | s |
      | 0 |
