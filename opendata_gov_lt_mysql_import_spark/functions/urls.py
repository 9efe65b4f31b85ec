"""URL canonicalization — the dedup key normalizer every web-corpus
pipeline runs before exact/near dedup (RefinedWeb §3.1 runs URL dedup
before content dedup; CCNet groups by normalized URL for provenance).

Pure JVM column expressions (regexp + array HOFs) — no UDF, map-only,
so canonicalization adds zero shuffles in front of the dedup groupBy.
The reference (odgovlt.py) has no URL surface; this is beyond-reference
training-data-pipeline machinery.

Canonical form (documented, mirrored exactly by the DuckDB oracle in
queries_ml.url_canonical_dedup):

- fragment stripped;
- scheme lowercased;
- host lowercased, the scheme's OWN default port stripped (:80 only
  for http, :443 only for https — an http server genuinely listening
  on 443 is a different resource and must not merge), leading
  ``www.`` stripped;
- path: trailing slashes stripped, empty path becomes ``/``;
- query params: tracking params (utm_*, fbclid, gclid) dropped, the
  rest SORTED and rejoined — param order is transport noise, not
  identity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url"]

#: params that never affect page identity (click-tracking attribution)
_TRACKING_RE = "^(utm_|fbclid|gclid)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract. Malformed
    inputs degrade gracefully: a missing scheme yields scheme '' (the
    rebuilt URL keeps '://' absent), a missing query yields no '?'."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    default_port = (
        F.when(scheme == "http", F.lit(":80"))
        .when(scheme == "https", F.lit(":443"))
        .otherwise(F.lit(""))
    )
    lower_hp = F.lower(hostport)
    stripped = F.when(
        (default_port != "") & lower_hp.endswith(default_port),
        lower_hp.substr(
            F.lit(1), F.length(lower_hp) - F.length(default_port)
        ),
    ).otherwise(lower_hp)
    host = F.regexp_replace(stripped, r"^www\.", "")
    rawpath = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(rawpath, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(nofrag, r"\?([^#]*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.concat_ws("&", kept))
    ).otherwise(F.lit(""))
    spart = F.when(scheme != "", F.concat(scheme, F.lit("://"))).otherwise(
        F.lit("")
    )
    return F.concat(spart, host, path, qpart)
