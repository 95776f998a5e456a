"""Web-specific normalization ops for crawl pipelines.

`canonical_url_col` reduces a URL to its dedup key with a fixed,
documented rule chain — every step is a JVM-side regexp inside
whole-stage codegen, and each regex has a byte-identical ANSI-SQL twin
(parity matters more than exhaustiveness: both engines must bucket the
same rows together):

1. lowercase + trim
2. strip scheme (http/https) and a leading www.
3. drop the fragment (#...)
4. drop tracking query params (utm_*, fbclid, gclid, msclkid, ref)
5. repair the separator a removed first-param leaves behind ("?&" -> "?")
6. strip a trailing "?" or "/"
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_RE = r"[?&](utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*"

# ordered (pattern, replacement) chain — the SQL twin renders the same
CANONICAL_STEPS = (
    (r"^https?://", ""),
    (r"^www\.", ""),
    (r"#.*$", ""),
    (TRACKING_RE, ""),
    (r"\?&", "?"),
    (r"[?/]+$", ""),
)


def canonical_url_col(col: Column) -> Column:
    u = F.lower(F.trim(col))
    for pat, rep in CANONICAL_STEPS:
        u = F.regexp_replace(u, pat, rep)
    return u


def canonical_url_sql(expr: str) -> str:
    """The DuckDB twin of canonical_url_col over an SQL expression."""
    u = f"lower(trim({expr}))"
    for pat, rep in CANONICAL_STEPS:
        sql_pat = pat.replace("'", "''")
        u = f"regexp_replace({u}, '{sql_pat}', '{rep}', 'g')"
    return u
