"""Driver-conformance query battery — aggregator.

The former 17k-line monolith now lives in qsubstrate.py (shared
helpers + the GuardedRegistry instances) and queries_w*.py (the
wave chunks, executed in original statement order so QUERIES /
ORACLE_SQL contents and ordering are unchanged).  This module
re-exports EVERY name the chunks define, so existing
``from ...pipelines.queries import X`` call sites (tests, bench,
extras, __ray_entry__) keep working untouched.  Import the chunks
ONLY via this module (direct chunk imports would re-register and
raise the GuardedRegistry duplicate error under a fresh module
object; via this aggregator Python caches them in sys.modules)."""
from __future__ import annotations

from . import qsubstrate as _sub  # noqa: E402
from . import queries_w1 as _queries_w1  # noqa: E402
from . import queries_w2 as _queries_w2  # noqa: E402
from . import queries_w3 as _queries_w3  # noqa: E402
from . import queries_w4 as _queries_w4  # noqa: E402

for _m in (_sub, _queries_w1, _queries_w2, _queries_w3, _queries_w4):
    for _k, _v in vars(_m).items():
        if not _k.startswith('__') and _k not in globals():
            globals()[_k] = _v
del _m, _k, _v
