"""Pipeline metrics mirroring Beats' monitoring counters.

Reference: libbeat/publisher/pipeline/monitoring.go:80-116 —
``pipeline.events.total`` (entered the pipeline), ``.filtered``
(dropped by processors), ``.published`` (handed to outputs),
``.dropped``/``.failed`` (sink-side); per-output delivery stats
libbeat/outputs/metrics.go:32-60.

Implementation: ``df.observe`` — accumulator-backed named metrics that
ride the SAME action as the write (zero extra passes over the data, the
scale-correct way to count at 100 TB). ``filtered`` falls out as
``total - published`` per monitoring.go:24-56's invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation


class PipelineMetrics:
    """Attach observation points; read after the job's action ran."""

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def observe_total(self, df: DataFrame) -> DataFrame:
        obs = Observation("pipeline.events.total")
        self._obs["total"] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("n"))

    def observe_stage(self, df: DataFrame, stage: str) -> DataFrame:
        """Rows leaving a processor stage — the per-processor in/out/
        dropped counters (monitoring.go:139-177): stage N's `in` is
        stage N-1's `out`, `dropped` is the difference."""
        obs = Observation(f"pipeline.{stage}")
        self._obs[f"stage:{stage}"] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("n"))

    def observe_published(
        self, df: DataFrame, sink_names: list[str] | None = None, sink_col: str = "_meta_sink"
    ) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n")]
        if sink_names and sink_col in df.columns:
            for s in sink_names:
                aggs.append(
                    F.sum(F.when(F.col(sink_col) == s, 1).otherwise(0)).alias(f"sink.{s}")
                )
        obs = Observation("pipeline.events.published")
        self._obs["published"] = obs
        return df.observe(obs, *aggs)

    def collect(self) -> dict[str, int]:
        """Counter snapshot (call after the action). Keys follow the
        reference's metric names."""
        out: dict[str, int] = {}
        total = self._obs.get("total")
        pub = self._obs.get("published")
        if total is not None:
            out["pipeline.events.total"] = int(total.get["n"])
        if pub is not None:
            got = pub.get
            out["pipeline.events.published"] = int(got["n"])
            for k, v in got.items():
                if k.startswith("sink."):
                    out[f"output.{k[5:]}.events.acked"] = int(v or 0)
        for key, obs in self._obs.items():
            if key.startswith("stage:"):
                out[f"pipeline.{key[6:]}.events.out"] = int(obs.get["n"])
        if "pipeline.events.total" in out and "pipeline.events.published" in out:
            out["pipeline.events.filtered"] = (
                out["pipeline.events.total"] - out["pipeline.events.published"]
            )
        return out
