"""Engine configuration — the analytic subset of the reference's YAML
config (`specs/config.json` / `specs/config.py`), loaded and validated
without external codegen deps.

Covered keys (reference paths in parens):

- ``clusters.<name>`` — cluster entries (config.json top level)
- ``governance.topic_naming_convention.regexes`` / ``ignore_regexes``
  (`specs/config.py:460-471`)
- ``governance.consumer_groups_naming_convention`` (same shape; the
  reference's CG path bug is opt-in via ``reference_compatible``)
- ``cluster_scan_interval_in_seconds`` (default 60, `specs/config.py:458`)
- ``evaluation_period_in_seconds`` (default 60, `specs/config.py:287`)
- ``schema_registry_scan_interval`` (default 300, `specs/config.py:417`)
- ``topic_include_regexes`` / ``topic_exclude_regexes``
  (`specs/config.py:464-465` — declared-but-unused in the reference;
  applied here, see usage.apply_topic_filters)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NamingConvention:
    regexes: list[str] = field(default_factory=list)
    ignore_regexes: list[str] = field(default_factory=list)


@dataclass
class Governance:
    topic_naming_convention: NamingConvention | None = None
    consumer_groups_naming_convention: NamingConvention | None = None
    reference_compatible: bool = False


@dataclass
class ClusterConfig:
    name: str = "primary"
    cluster_scan_interval_in_seconds: int = 60
    evaluation_period_in_seconds: int = 60
    schema_registry_scan_interval: int = 300
    topic_include_regexes: list[str] = field(default_factory=list)
    topic_exclude_regexes: list[str] = field(default_factory=list)
    governance: Governance | None = None
    # librdkafka-style client config (`cluster_config.kafka` in the
    # reference spec); {{resolve:...}} values interpolated at load time
    # when a secrets fetcher is supplied (S11)
    kafka: dict = field(default_factory=dict)


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"invalid config: {msg}")


def load_config(
    path: str, secrets_fetcher=None
) -> dict[str, ClusterConfig]:
    """YAML → validated ClusterConfig per cluster (S10 analog). When
    ``secrets_fetcher`` is given, ``{{resolve:...}}`` strings in each
    cluster's ``kafka`` client config are interpolated (S11,
    `aws_helpers/kafka_client_secrets.py:28-65`)."""
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    _require(isinstance(raw, dict), "top level must be a mapping")
    clusters_raw = raw.get("clusters", {"primary": {}})
    _require(isinstance(clusters_raw, dict), "clusters must be a mapping")
    out: dict[str, ClusterConfig] = {}
    for name, c in clusters_raw.items():
        c = c or {}
        _require(isinstance(c, dict), f"cluster {name} must be a mapping")
        gov = None
        g = c.get("governance")
        if g:
            def nc(key: str) -> NamingConvention | None:
                sub = g.get(key)
                if not sub:
                    return None
                _require(
                    isinstance(sub.get("regexes", []), list),
                    f"{key}.regexes must be a list",
                )
                return NamingConvention(
                    regexes=list(sub.get("regexes", [])),
                    ignore_regexes=list(sub.get("ignore_regexes", [])),
                )

            gov = Governance(
                topic_naming_convention=nc("topic_naming_convention"),
                consumer_groups_naming_convention=nc(
                    "consumer_groups_naming_convention"
                ),
                reference_compatible=bool(g.get("reference_compatible", False)),
            )
        cfg = ClusterConfig(
            name=name,
            cluster_scan_interval_in_seconds=int(
                c.get("cluster_scan_interval_in_seconds", 60)
            ),
            evaluation_period_in_seconds=int(
                c.get("evaluation_period_in_seconds", 60)
            ),
            schema_registry_scan_interval=int(
                c.get("schema_registry_scan_interval", 300)
            ),
            topic_include_regexes=list(c.get("topic_include_regexes", [])),
            topic_exclude_regexes=list(c.get("topic_exclude_regexes", [])),
            governance=gov,
            kafka=dict(c.get("kafka", {})),
        )
        if secrets_fetcher is not None and cfg.kafka:
            from .secrets import resolve_client_config

            cfg.kafka = resolve_client_config(cfg.kafka, secrets_fetcher)
        _require(
            cfg.cluster_scan_interval_in_seconds > 0,
            "cluster_scan_interval_in_seconds must be > 0",
        )
        _require(
            cfg.evaluation_period_in_seconds > 0,
            "evaluation_period_in_seconds must be > 0",
        )
        out[name] = cfg
    return out
