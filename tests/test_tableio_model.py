"""Model-based test of the SnapshotStore delta chain (sources/tableio).

Hypothesis drives random interleavings of write / commit / compact
(with and without a revocation-style transform) against a pure-Python
model of the store; after every operation the full table contents at
every committed wave must equal the model exactly (multiset — the
union-all keeps duplicates across waves by design). This is the
sequence-level complement to the targeted crash-injection tests in
test_resume.py / test_revoke.py: those pin individual failure windows,
this pins that no legal operation ORDER can corrupt the chain.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from torscrapper_spark.sources.tableio import SnapshotStore

SCHEMA = "url_hash long"

# an op is one of:
#   ("write", [rows])            write the next wave's delta
#   ("compact", None | int)      compact at the last written wave;
#                                 int v = transform filtering out v
#                                 (the seed-revocation shape)
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("write"),
            st.lists(st.integers(min_value=0, max_value=9), max_size=4),
        ),
        st.tuples(st.just("compact"),
                  st.one_of(st.none(), st.integers(0, 9))),
    ),
    min_size=1,
    max_size=8,
)


def _read_all(spark, store, table, upto):
    return sorted(
        r.url_hash
        for r in store.read_upto(spark, table, upto).collect()
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_delta_chain_matches_model_under_any_op_order(spark, ops):
    root = tempfile.mkdtemp(prefix="tsnap_model_")
    try:
        store = SnapshotStore(root)
        model: list[list[int]] = []  # wave -> rows
        for op, arg in ops:
            if op == "write":
                wave = len(model)
                df = spark.createDataFrame(
                    [(int(v),) for v in arg], SCHEMA
                )
                store.write(df, "t", wave)
                store.commit(wave, {"rows": len(arg)})
                model.append(list(arg))
            elif op == "compact" and model:
                upto = len(model) - 1
                if arg is None:
                    store.compact(spark, "t", upto, width=1)
                else:
                    v = int(arg)
                    store.compact(
                        spark, "t", upto, width=1,
                        transform=lambda df, v=v: df.filter(
                            f"url_hash <> {v}"
                        ),
                    )
                    model = [
                        [x for x in rows if x != v] for rows in model
                    ]
            # invariant: every committed wave reads back exactly the
            # model's union-to-there. After a compaction the chain below
            # the base is gone, so only the LAST wave is addressable
            # (the contract resume relies on); pre-compaction waves are
            # checked on the way (each loop iteration re-checks last).
            if model:
                last = len(model) - 1
                want = sorted(x for rows in model[: last + 1] for x in rows)
                assert _read_all(spark, store, "t", last) == want
        # final state fully consistent with one more commit+write cycle
        if model:
            wave = len(model)
            df = spark.createDataFrame([(99,)], SCHEMA)
            store.write(df, "t", wave)
            store.commit(wave, {"rows": 1})
            model.append([99])
            want = sorted(x for rows in model for x in rows)
            assert _read_all(spark, store, "t", len(model) - 1) == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
