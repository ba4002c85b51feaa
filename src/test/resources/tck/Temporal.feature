# Scenarios authored for graft's TCK-style runner (public openCypher TCK
# step format; behavior per the openCypher specification).

Feature: Temporal

  Scenario: date construction from string and component access
    Given any graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | y    | m | dd |
      | 2024 | 3 | 15 |

  Scenario: date construction from a component map
    Given any graph
    When executing query:
      """
      WITH date({year: 2020, month: 2, day: 29}) AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | y    | m | dd |
      | 2020 | 2 | 29 |

  Scenario: date plus duration in days
    Given any graph
    When executing query:
      """
      WITH date('2024-01-30') + duration({days: 3}) AS d
      RETURN toString(d) AS s
      """
    Then the result should be, in any order:
      | s            |
      | '2024-02-02' |

  Scenario: date plus months clamps to month end
    Given any graph
    When executing query:
      """
      WITH date('2024-01-31') + duration({months: 1}) AS d
      RETURN toString(d) AS s
      """
    Then the result should be, in any order:
      | s            |
      | '2024-02-29' |

  Scenario: duration between two dates in days
    Given any graph
    When executing query:
      """
      WITH duration.inDays(date('2024-01-01'), date('2024-03-01')) AS d
      RETURN d.days AS days
      """
    Then the result should be, in any order:
      | days |
      | 60   |

  Scenario: duration multiplication scales components
    Given any graph
    When executing query:
      """
      WITH duration({days: 2, hours: 3}) * 2 AS d
      RETURN d.days AS days
      """
    Then the result should be, in any order:
      | days |
      | 4    |

  Scenario: datetime minus duration
    Given any graph
    When executing query:
      """
      WITH datetime('2024-01-05T10:00:00Z') - duration({hours: 4}) AS t
      RETURN t.hour AS h, t.day AS d
      """
    Then the result should be, in any order:
      | h | d |
      | 6 | 5 |

  Scenario: temporal comparison orders chronologically
    Given any graph
    When executing query:
      """
      RETURN date('2024-01-01') < date('2024-06-01') AS a
      """
    Then the result should be, in any order:
      | a    |
      | true |

  Scenario: date truncation to the month
    Given any graph
    When executing query:
      """
      WITH date.truncate('month', date('2024-03-15')) AS d
      RETURN toString(d) AS s
      """
    Then the result should be, in any order:
      | s            |
      | '2024-03-01' |

  Scenario: weekday component
    Given any graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN d.dayOfWeek AS dow
      """
    Then the result should be, in any order:
      | dow |
      | 5   |
