"""Secret interpolation for Kafka client configs (S11).

The reference resolves CloudFormation-style dynamic references in the
librdkafka client config — any string value of the form
``{{resolve:secretsmanager:<secret>[:SecretString[:<key>[:<version>]]]}}``
is replaced with the secret value, and resolution failures fall back to
the raw string (`aws_helpers/kafka_client_secrets.py:28-65`).

Spark-first shape: resolution is pure config-time data transformation
with a pluggable ``fetch`` seam — the AWS SecretsManager binding is one
implementation (import-guarded; boto3 is not in this container), a dict
lookup is another (tests, local files, k8s secrets). No analytics-plane
coupling: the resolved dict feeds the collector, not the engine.
"""

from __future__ import annotations

import logging
from typing import Callable, Mapping

log = logging.getLogger(__name__)

RESOLVE_PREFIX = "{{resolve:"

# fetch(secret_name, json_key, version) -> secret value
Fetcher = Callable[[str, str | None, str | None], str]


def parse_resolve_string(value: str) -> tuple[str, str | None, str | None]:
    """``{{resolve:secretsmanager:name[:SecretString[:key[:version]]]}}``
    → (secret_name, key, version). Raises ValueError on malformed input
    (the reference's parse_secret_resolve_string contract)."""
    if not (value.startswith(RESOLVE_PREFIX) and value.endswith("}}")):
        raise ValueError(f"not a resolve string: {value!r}")
    parts = value[len(RESOLVE_PREFIX) : -2].split(":")
    if len(parts) < 2 or parts[0] != "secretsmanager" or not parts[1]:
        raise ValueError(f"unsupported resolve target: {value!r}")
    if len(parts) >= 3 and parts[2] not in ("", "SecretString"):
        raise ValueError(f"unsupported secret field {parts[2]!r}")
    key = parts[3] if len(parts) >= 4 and parts[3] else None
    version = parts[4] if len(parts) >= 5 and parts[4] else None
    return parts[1], key, version


def resolve_client_config(
    client_config: Mapping[str, object], fetch: Fetcher
) -> dict[str, object]:
    """Return a NEW dict with every ``{{resolve:...}}`` string value
    replaced via ``fetch``; non-matching values pass through untouched,
    and a failing resolution keeps the value as-is with a logged error —
    exactly the reference's fallback (`kafka_client_secrets.py:41-52`)."""
    out: dict[str, object] = {}
    for k, v in client_config.items():
        if isinstance(v, str) and v.startswith(RESOLVE_PREFIX):
            try:
                name, key, version = parse_resolve_string(v)
                out[k] = fetch(name, key, version)
            except Exception as error:  # noqa: BLE001 — reference keeps going
                log.error("Error while resolving %s: %s. Using as-is.", v, error)
                out[k] = v
        else:
            out[k] = v
    return out


def dict_fetcher(store: Mapping[str, object]) -> Fetcher:
    """Fetcher over an in-memory mapping: secret value is either a string
    or a dict of json keys (SecretString JSON semantics)."""

    def fetch(name: str, key: str | None, version: str | None) -> str:
        secret = store[name]
        if key is not None:
            return secret[key]  # type: ignore[index]
        if isinstance(secret, Mapping):
            raise ValueError(f"secret {name} is a JSON object; key required")
        return secret  # type: ignore[return-value]

    return fetch


def aws_secretsmanager_fetcher() -> Fetcher:
    """The live AWS binding. boto3 is not available in this environment;
    the seam exists so a deployment can plug it in
    (`kafka_client_secrets.py:44-45` retrieve_secret)."""
    try:
        import boto3  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "AWS SecretsManager resolution requires boto3; supply a custom "
            "Fetcher (e.g. dict_fetcher) instead"
        ) from exc
    import json

    client = boto3.session.Session().client("secretsmanager")  # pragma: no cover

    def fetch(name, key, version):  # pragma: no cover
        kwargs = {"SecretId": name}
        if version:
            kwargs["VersionId"] = version
        value = client.get_secret_value(**kwargs)["SecretString"]
        return json.loads(value)[key] if key else value

    return fetch  # pragma: no cover
