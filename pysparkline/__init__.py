"""pysparkline: a PySpark-native OLAP acceleration engine.

Re-implements the query and data-processing capabilities of
hbutani/spark-druid-olap (the Sparkline BI Accelerator) Spark-first: the Druid
index becomes a Spark-managed flat+cube Parquet materialization, the Catalyst
plan-rewrite becomes a Python planner over a five-shape query IR, and query
execution is plain DataFrame pipelines optimized by Catalyst/Tungsten.
"""

from . import ir, transforms  # noqa: F401
from .index import (  # noqa: F401
    CubeSpec,
    HistSpec,
    IndexConfig,
    MetricSpec,
    OlapIndex,
    ThetaSpec,
    TopKSpec,
    flatten_star,
)
from .lowering import Backing, lower  # noqa: F401
from .metadata import (  # noqa: F401
    EqualityCondition,
    FDGraph,
    FunctionalDependency,
    StarRelation,
    StarSchema,
    StarSchemaError,
)
from .planner import PlanDecision, choose_backing  # noqa: F401
from .session import OlapCatalog, OlapContext, get_spark, prep  # noqa: F401

__version__ = "0.1.0"
