#!/usr/bin/env python3
"""Dev-only fidelity check: execute the REFERENCE's own parse_app_price
(/root/reference, imported read-only with its service deps stubbed) against
graft's parse expression (the DuckDB oracle form, which the driver's gate
already proves hash-identical to the Spark implementation) over a grid of
price strings. Reports any semantic divergence. No reference code is
copied — it is imported and executed in place.
"""
import sys, types, math, json
import duckdb

# stub the reference's service modules so the transformer module imports
# without boto3/requests/API access
stub = types.ModuleType("Scripts.common.external_resources")
for cls in ("SteamWebApi", "OpenExRatesApi", "S3Bucket"):
    setattr(stub, cls, type(cls, (), {}))
scripts_pkg = types.ModuleType("Scripts"); scripts_pkg.__path__ = []
common_pkg = types.ModuleType("Scripts.common"); common_pkg.__path__ = []
sys.modules["Scripts"] = scripts_pkg
sys.modules["Scripts.common"] = common_pkg
sys.modules["Scripts.common.external_resources"] = stub
sys.path.insert(0, "/root/reference")

import importlib.util
spec = importlib.util.spec_from_file_location(
    "ref_transformer",
    "/root/reference/Scripts/transformers/steam_prices_transformer.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

class _Dummy:  # parse_app_price only touches self._logger
    import logging
    _logger = logging.getLogger("x")
ref_parse = mod.SteamPricesETL.parse_app_price

GRAFT_EXPR = """
WITH s AS (SELECT ? AS price_str, CAST(? AS DOUBLE) AS rate),
ms AS (SELECT *, regexp_extract(price_str, '[0-9]+[,. ]?[0-9]*') AS m FROM s),
ps AS (SELECT *,
  TRY_CAST(replace(replace(replace(m,' ',''),'.',''),',','.') AS DOUBLE)/rate AS p1,
  TRY_CAST(replace(replace(m,' ',''),',','') AS DOUBLE)/rate AS p2 FROM ms)
SELECT CASE WHEN m IS NULL OR m='' THEN NULL WHEN p1>100 OR p1<0.1 THEN p2 ELSE p1 END FROM ps
"""

cases = []
for s in ["12,34", "12.34", "1234,56", "1234.56", "1 234,56", "1.234,56",
          "$ 19.99", "19,99€", "CDN$ 21.99", "¥ 1980", "R$ 36,99", "36",
          "0,09", "0.09", "99,99", "100,00", "100,01", "250,00", "N/A",
          "", "Free", "free to play", "1", "7", "12 345", "12.3", "12,3",
          "9999999,99", "0", "00,10", "   5,00  ", "5,", "5."]:
    for rate in [1.0, 1.5, 2.5, 4.0, 25.0]:
        cases.append((s, rate))

con = duckdb.connect()
mism = []
for s, rate in cases:
    _, ref = ref_parse(_Dummy(), s, rate, "xxx")
    got = con.execute(GRAFT_EXPR, [s, rate]).fetchone()[0]
    ref_null = ref is None or (isinstance(ref, float) and math.isnan(ref))
    if ref_null != (got is None) or (
            not ref_null and got is not None and abs(ref - got) > 1e-9):
        mism.append({"str": s, "rate": rate, "ref": None if ref_null else ref,
                     "graft": got})
print(json.dumps({"cases": len(cases), "mismatches": mism}, indent=1))
