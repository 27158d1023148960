"""Regenerate the pinned PCA component literals in
``etl_python_spark/operators/similarity.py`` (``PCA_PINNED_NANO``).

The oracled ``pca_project`` query projects embeddings onto a FIXED
component matrix so the Spark query and the DuckDB oracle share the
exact same literals at every scale factor (eigh is not restatable in
SQL; the fit itself is covered by the oracled ``embedding_covariance``
plus the planted-axes unit test).  The pinned matrix is the engine's
shipped "model", fitted once at the driver's correctness scale:

    python tools/pin_pca.py [/root/testdata/sf0.01]

prints the ``PCA_PINNED_NANO`` tuple to paste into similarity.py.
Re-run only if the driver regenerates the testdata distribution — the
oracle gate stays green regardless (both sides use the same pinned
literals); re-pinning just keeps the components meaningful for the
current corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_python_spark.operators import similarity as sim
    from etl_python_spark.session import get_spark

    spark = get_spark("pin-pca")
    spark.sparkContext.setLogLevel("ERROR")
    comps, explained = sim._pca_fit_components(
        spark, sf_dir, sim.PCA_COMPONENTS
    )
    print(f"# fitted at {sf_dir}; explained variance: "
          f"{[round(float(v), 4) for v in explained]}")
    print("PCA_PINNED_NANO = (")
    for c in range(comps.shape[1]):
        row = ", ".join(
            str(int(round(float(comps[i, c]) * 1e9)))
            for i in range(comps.shape[0])
        )
        print(f"    ({row}),")
    print(")")


if __name__ == "__main__":
    main()
