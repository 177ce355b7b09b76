"""Command-line entry points mirroring the reference's ``auto_annotate_*``
mains (one module per flavor, each runnable as ``python -m ...cli.<name>``).

The flag surface follows reference ``auto_annotate_utils.py:116-325`` plus the
per-flavor extras; Beam/Dataflow cloud flags are replaced by a small Spark
group (``--spark-cpus`` / ``--spark-shuffle-partitions``) since the execution
engine here is Spark (``spark-submit --py-files`` on a cluster, local[N] in
this sandbox).
"""
