"""Java SimpleDateFormat -> java.time DateTimeFormatter pattern translation.

The reference's temporal functions take SimpleDateFormat patterns
(runtime/functions/impl/TemporalFunctions.java; doc transform.md:220-233),
while Spark >= 3.0 uses java.time patterns
(spark.apache.org/docs/latest/sql-ref-datetime-pattern.html). Most letters
coincide (y M d H m s S E a z X Z); the divergences handled here:

    u  SDF: day-of-week number (1=Mon)   -> java.time 'e'
    YYYY (week year) is passed through   -- same letter both sides
    'text' quoting is identical          -- passed through

Unsupported-by-Spark letters (G era variations are fine; 'W' week-in-month
and 'F' day-of-week-in-month raise in Spark) are passed through and will
surface as Spark analysis errors, which matches the fail-on-bad-pattern
behavior of the reference.
"""

from __future__ import annotations


def translate_simple_date_format(pattern: str) -> str:
    out = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "'":
            # quoted literal: copy verbatim through closing quote
            j = i + 1
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(pattern[i : j + 1])
            i = j + 1
            continue
        if ch == "u":
            # SDF: ISO day-of-week number; java.time: 'e' (localized dow)
            j = i
            while j < n and pattern[j] == "u":
                j += 1
            out.append("e" * (j - i))
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)
