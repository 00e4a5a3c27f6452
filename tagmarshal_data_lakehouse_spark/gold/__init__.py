"""Gold model DAG (the reference's dbt project re-expressed on Spark SQL).

Each dbt model (pipeline/gold/models/**) becomes a named Spark SQL string
over temp views; `ref()`/`source()` edges become the explicit `deps`
lists, and `build_all` materializes in topological order — the manual
common-subexpression strategy the reference relies on (models read
fact_rounds instead of re-scanning fix-grain telemetry; SURVEY §4).
"""

from .models import MODELS, GoldBuilder, build_all  # noqa: F401
