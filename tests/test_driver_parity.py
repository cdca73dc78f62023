"""Driver-environment parity: the grading driver imports
__spark_entry__ with ITS OWN session and cwd, where this repo is NOT on
the executors' PYTHONPATH. cloudpickle ships nested closures by value,
but any Python kernel that references a module-level helper pickles it
BY REFERENCE and dies on the worker with ModuleNotFoundError — a bug
invisible to every in-repo test run (cwd = repo root puts the package
on the workers' path for free).

Regression: d19's LSH kernel once called a module-global sign-matrix
builder and errored only under the driver.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

# every registered query whose plan embeds a Python kernel
_KERNEL_QUERIES = [
    "d7_embedding_neardup",  # blocked all-pairs applyInPandas
    "d15_dup_clusters",
    "d19_embedding_neardup_lsh",  # LSH bit kernel
    "s4_kmeans_clusters",  # assignment + partial-sum kernels
    "s5_ivf_topk_kmeans",
    "s6_pq_topk",  # per-subspace Lloyd + encode kernels
    "s8_ivfpq_topk",  # composes the kmeans + PQ kernels
    "s9_semdedup",  # kmeans kernels feeding the within-cluster pair join
    "m1_media_features",  # multimodal Arrow kernels
    "m2_media_resize",
    "q18_sessionization",  # applyInPandasWithState
]


def test_python_kernels_survive_foreign_cwd(tmp_path):
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[4]").getOrCreate()
        import __spark_entry__ as E
        qs = E.queries()
        for name in {_KERNEL_QUERIES!r}:
            n = qs[name](spark, "/root/testdata/sf0.001").count()
            assert n >= 0, name
            print(name, n, flush=True)
        spark.stop()
        print("FOREIGN_CWD_OK")
        """
    )
    p = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # decisive detail: NOT the repo root
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert "FOREIGN_CWD_OK" in p.stdout, (p.stdout[-1500:], p.stderr[-1500:])
