"""Deterministic syslog wire corpus (FIXTURES.md §B.1).

Used by the gated parse queries (inlined as VALUES on the oracle side and
createDataFrame on the Spark side) and by the streaming tests as replay
input. The first entry is the reference README's own example line
(/root/reference README.md:45).
"""

from __future__ import annotations

SYSLOG_CORPUS: list[str] = [
    # RFC 5424 — the reference README example
    "<34>1 2003-10-11T22:14:15.003Z localhost.elodina.net su - ID23 - a simple message",
    # RFC 5424 with structured data + fractional seconds + procid
    '<165>1 2024-02-05T17:32:18.500Z web01.example.com nginx 912 REQ [exampleSDID@32473 iut="3" eventSource="app"] GET /index.html 200',
    # RFC 5424 multiple SD blocks, no message
    '<14>1 2024-03-01T00:00:00Z db01 postgres 2201 QRY [a@1 x="1"][b@2 y="2"]',
    # RFC 5424 all-nil header fields
    "<13>1 2024-06-30T23:59:59.999Z - - - - - -",
    # RFC 5424 with timezone offset
    "<190>1 2024-07-15T08:30:00+02:00 edge-7 collector 77 M7 - offset timestamp line",
    # RFC 5424 PRI bounds
    "<0>1 2024-01-01T00:00:00Z h0 app0 - - - emergency at kern",
    "<191>1 2024-01-01T00:00:01Z h191 app191 - - - local7 debug",
    # RFC 3164 classics
    "<13>Aug 13 03:38:00 web01 nginx[912]: GET /index.html 200",
    "<34>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick on /dev/pts/8",
    # RFC 3164 space-padded single-digit day
    "<78>Aug  5 09:05:01 cron-host CRON[12345]: (root) CMD (run-parts /etc/cron.hourly)",
    # RFC 3164 no pid, empty message
    "<86>Sep 30 12:00:00 authsrv sshd: ",
    # Non-ASCII payload (UTF-8)
    "<13>1 2024-05-05T05:05:05Z intl-host app-日本 - - - こんにちは世界 — naïve café",
    # Unparseable: missing PRI
    "Aug 13 03:38:00 web01 nginx: no pri header here",
    # Unparseable: PRI out of range
    "<999>1 2024-01-01T00:00:00Z h x - - - pri out of range",
    # Unparseable: garbage
    "completely unstructured line :: not syslog at all",
    # Leading whitespace (invalid per RFC, must stay unparsed)
    "  <13>Aug 13 03:38:00 web01 nginx[912]: leading spaces",
    # Very long line (> 8 KB payload)
    "<13>1 2024-04-04T04:04:04Z bulk-host bulk 1 - - " + "x" * 8192,
]


def corpus_values_sql() -> str:
    """The corpus as a DuckDB VALUES relation aliased ``t(line)``."""
    quoted = ", ".join("('" + line.replace("'", "''") + "')" for line in SYSLOG_CORPUS)
    return f"(VALUES {quoted}) AS t(line)"


def corpus_values_idx_sql() -> str:
    """The corpus as an indexed DuckDB VALUES relation ``t(idx, line)`` —
    the index lets oracles reconstruct file byte offsets (cumulative
    ``strlen + 1``) for the Python DataSource gates."""
    quoted = ", ".join(
        f"({i}, '" + line.replace("'", "''") + "')" for i, line in enumerate(SYSLOG_CORPUS)
    )
    return f"(VALUES {quoted}) AS t(idx, line)"
