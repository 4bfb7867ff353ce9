"""Properties-file configuration for the DA-MDS driver (reference parity).

The reference is configured by a java-properties file
(config.properties; parsed via DAMDSSection,
damds/configuration/section/DAMDSSection.java:10-57). This module accepts
the SAME keys and maps them onto ``algos.damds.damds`` keyword arguments,
so a user of the reference can bring their config file unchanged:

    cfg = load_properties("config.properties")
    res = damds_from_config(blocks, cfg)

Keys the Spark engine does not need (file-layout plumbing like
OutputFolder/IterationFile — state never round-trips through files here,
SURVEY I3) are accepted and ignored.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

_BOOL = {"true": True, "false": False}


def load_properties(path: str) -> dict[str, str]:
    """Minimal java-properties reader: key=value, '#'/'!' comments."""
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line[0] in "#!":
                continue
            if "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip().strip('"')
    return out


def damds_kwargs(cfg: dict[str, str]) -> dict[str, Any]:
    """Reference config keys → damds() keyword arguments."""
    kw: dict[str, Any] = {}
    if "TargetDimension" in cfg:
        kw["dim"] = int(cfg["TargetDimension"])
    if "Alpha" in cfg:
        kw["alpha"] = float(cfg["Alpha"])
    if "TminFactor" in cfg:
        kw["t_min_factor"] = float(cfg["TminFactor"])
    if "MaxTempLoops" in cfg:
        kw["max_temp_loops"] = int(cfg["MaxTempLoops"])
    if "MaxStressLoops" in cfg:
        kw["max_stress_loops"] = int(cfg["MaxStressLoops"])
    if "Threshold" in cfg:
        kw["stress_threshold"] = float(cfg["Threshold"])
    if "CGIterations" in cfg:
        kw["cg_iters"] = int(cfg["CGIterations"])
    if "CGErrorThreshold" in cfg:
        kw["cg_threshold"] = float(cfg["CGErrorThreshold"])
    if _BOOL.get(cfg.get("IsSammon", "false").lower(), False):
        # reference default sammonFactor = 0.001 (io/RowBlock.java:107-113);
        # the config carries only the on/off switch
        kw["sammon_factor"] = float(cfg.get("SammonFactor", "0.001"))
    return kw


def damds_from_config(blocks: DataFrame, cfg: dict[str, str], **overrides: Any):
    """Run the anneal with a reference-style config dict."""
    from flink_mm_spark.algos.damds import damds

    n_points = int(cfg["NumberDataPoints"])
    kw = damds_kwargs(cfg)
    kw.update(overrides)
    return damds(blocks, n_points, **kw)
