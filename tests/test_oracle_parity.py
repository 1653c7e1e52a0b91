"""Oracle parity — mirrors the driver's correctness gate: run every
registered Spark query and its DuckDB oracle on the same parquet tables,
compare row count, column names, and (column-name-sorted, row-sorted) values.

Exact equality is required for strings/ints; floats must match to full
precision (the queries are designed to be bit-deterministic across engines —
see oracles.py).
"""

import math

import pytest

from one_one_one_rule_spark.queries import ORACLES, QUERIES


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = float(v)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, int):
                v = float(v) if False else int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, ddb, sf_dir):
    from one_one_one_rule_spark.oracles_ann import GENERATORS

    sdf = QUERIES[name](spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    # generated oracles embed trained model literals for a specific scale:
    # regenerate for THIS harness's sf_dir (the registered string targets
    # the driver's sf0.01 gate)
    oracle = GENERATORS[name](sf_dir) if name in GENERATORS else ORACLES[name]
    res = ddb.sql(oracle)
    dcols = [c.lower() for c in res.columns]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    sc = _canon(srows, scols)
    dc = _canon(drows, dcols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"
