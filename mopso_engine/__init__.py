"""mopso_engine — a PySpark-native MOPSO clustering analytics engine.

A from-scratch, DataFrame-first re-expression of the capabilities of the
reference repo HadwinLing/Apache-Spark-MOPSO-Clustering (multi-objective
particle-swarm clustering with MOCK-style Dev/Conn objectives, Pareto
archive with crowding distance, k-means / maximin initialization, and a
purity/accuracy/silhouette/DBI/inertia evaluation suite), plus
large-scale data-pipeline extensions (dedup, similarity search, text
analysis, streaming) under ``mopso_engine.ext``.

Design (see SURVEY.md §3.4/§7): the *data* path is declarative Spark
(DataFrame/SQL + Arrow-vectorized pandas UDF kernels); the *control*
path (swarm, archive) is tiny driver-side numpy, exactly as the
reference keeps it on the driver (Spark_MOPSO_Avg.scala:137-302).
"""

from mopso_engine.schema import MopsoConfig, BugCompat, POINTS_SCHEMA
from mopso_engine.engine import MopsoEngine, MopsoResult

__version__ = "0.1.0"

__all__ = [
    "MopsoConfig",
    "BugCompat",
    "POINTS_SCHEMA",
    "MopsoEngine",
    "MopsoResult",
]
