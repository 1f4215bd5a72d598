from beats_spark.plans.pipeline import PipelineConfig, RunResult, run, transform  # noqa: F401
from beats_spark.plans.router import META_SINK, route, sink_names  # noqa: F401
from beats_spark.plans.sinks import write_fanout, redirect_dead_letters  # noqa: F401
from beats_spark.plans.metrics import PipelineMetrics  # noqa: F401
from beats_spark.plans.lineage import run_checkpointed  # noqa: F401
