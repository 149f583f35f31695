"""Storage providers — multi-backend path resolution.

The reference resolves a pool's ``StorageProviderId`` to a fetch
backend through a provider map (schema/storage_provider.go:15-61:
id 1/2 → Arweave, 3 → KYVE storage, 4 → Turbo — each an endpoint +
retrieval scheme).  The lake analog is a registry of NAMED STORAGE
ROOTS: a source log or destination table addressed as
``provider://relative/path`` resolves to a concrete Spark-readable URI
(``file:/...``, ``s3a://bucket/...``, ``hdfs://nn/...``), optionally
carrying per-provider Hadoop configuration (credentials, endpoint —
the knobs an object-store provider needs) that is applied to the
session before any read.

Spark's Hadoop FileSystem layer already speaks every backend — this
registry only owns the NAMING indirection the reference has: data
addressed by (provider id, relative location), providers swappable per
deployment without touching job code.  Providers come from code
(``register_provider``), YAML config (``providers:`` section, loaded by
``load_providers``), or the CLI (``--provider name=root``).

URIs with no ``name://`` prefix — plain paths, ``file:/``, ``s3a://``,
any scheme the registry doesn't know — pass through untouched, so the
feature is zero-cost when unused.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+._-]*)://(.*)$")


@dataclass
class StorageProvider:
    name: str
    root: str  # concrete URI prefix: /path, file:/path, s3a://bucket/px
    hadoop_conf: dict[str, str] = field(default_factory=dict)


_REGISTRY: dict[str, StorageProvider] = {}


def register_provider(
    name: str, root: str, hadoop_conf: dict[str, str] | None = None
) -> StorageProvider:
    p = StorageProvider(name, root.rstrip("/"), dict(hadoop_conf or {}))
    _REGISTRY[name] = p
    return p


def clear_providers() -> None:
    _REGISTRY.clear()


def providers() -> dict[str, StorageProvider]:
    return dict(_REGISTRY)


def load_providers(raw: list[dict]) -> list[StorageProvider]:
    """Register providers from a parsed config section::

        providers:
          - name: warm
            root: /lake/warm
          - name: cold
            root: s3a://archive/lake
            hadoop_conf:
              fs.s3a.endpoint: https://storage.example
    """
    return [
        register_provider(
            d["name"], d["root"], d.get("hadoop_conf") or d.get("conf")
        )
        for d in raw
    ]


def resolve(uri: str, spark: SparkSession | None = None) -> str:
    """``name://rest`` → ``<root>/rest`` for a registered provider; any
    other URI (plain path, unknown scheme) passes through unchanged.
    When ``spark`` is given, the provider's Hadoop configuration is
    applied to the live session first — object-store credentials/
    endpoints land before the first FileSystem call."""
    m = _SCHEME_RE.match(uri)
    if not m:
        return uri
    name, rest = m.group(1), m.group(2)
    p = _REGISTRY.get(name)
    if p is None:
        return uri  # a real filesystem scheme (file:, s3a:, hdfs:, ...)
    if spark is not None and p.hadoop_conf:
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in p.hadoop_conf.items():
            hconf.set(k, str(v))
    return f"{p.root}/{rest}" if rest else p.root
