"""Named storage connections (the reference's ConnectionConfig).

The reference configures per-worker named endpoints of type Fs or S3 and
`read_files(..., connection=>'name')` selects one at scan time
(reference src/config/worker.rs:96-137; read_files_task.rs:65-114 parses
the named arg). Spark's equivalent is a path prefix plus Hadoop
configuration (fs.s3a.*), applied on the shared SparkContext.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class FsConnection:
    """Local/posix filesystem connection: glob paths resolve under base_path."""

    name: str
    base_path: str = ""

    def resolve(self, glob: str) -> str:
        if not self.base_path:
            return glob
        return posixpath.join(self.base_path, glob.lstrip("/"))

    def hadoop_conf(self) -> dict[str, str]:
        return {}


@dataclass(frozen=True)
class S3Connection:
    """S3 connection mapped onto s3a:// + fs.s3a.* Hadoop configuration.

    Mirrors the reference's S3 opendal config fields
    (src/config/worker.rs:115-137: endpoint/bucket/region/credentials).
    Credentials intentionally come from the environment/instance profile
    when not given explicitly.
    """

    name: str
    bucket: str
    region: str = ""
    endpoint: str = ""
    access_key_id: str = ""
    secret_access_key: str = ""
    path_style: bool = False

    def resolve(self, glob: str) -> str:
        return f"s3a://{self.bucket}/{glob.lstrip('/')}"

    def hadoop_conf(self) -> dict[str, str]:
        # Per-bucket scoped keys (hadoop-aws "per-bucket configuration"):
        # global fs.s3a.* keys would clobber each other when two named
        # connections use different endpoints/credentials — last one
        # registered would win for ALL buckets.
        p = f"fs.s3a.bucket.{self.bucket}"
        conf: dict[str, str] = {}
        if self.endpoint:
            conf[f"{p}.endpoint"] = self.endpoint
        if self.region:
            conf[f"{p}.endpoint.region"] = self.region
        if self.access_key_id:
            conf[f"{p}.access.key"] = self.access_key_id
        if self.secret_access_key:
            conf[f"{p}.secret.key"] = self.secret_access_key
        if self.path_style:
            conf[f"{p}.path.style.access"] = "true"
        return conf


Connection = FsConnection | S3Connection


@dataclass
class ConnectionRegistry:
    """Registry of named connections; 'default' is plain local fs."""

    connections: dict[str, Connection] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.connections.setdefault("default", FsConnection(name="default"))

    def register(self, conn: Connection) -> None:
        self.connections[conn.name] = conn

    def get(self, name: str | None) -> Connection:
        key = name or "default"
        if key not in self.connections:
            raise KeyError(
                f"unknown connection '{key}'; registered: {sorted(self.connections)}"
            )
        return self.connections[key]

    def resolve(self, glob: str, connection: str | None = None) -> str:
        return self.get(connection).resolve(glob)

    def apply_hadoop_conf(self, spark: SparkSession) -> None:
        """Apply every connection's Hadoop conf to the shared context."""
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for conn in self.connections.values():
            for k, v in conn.hadoop_conf().items():
                hconf.set(k, v)
