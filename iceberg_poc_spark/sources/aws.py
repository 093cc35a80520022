"""AWS deployment configuration surface: Glue catalog, S3/S3A wiring, and
per-tenant SSE-KMS write routing — as Spark/Iceberg conf builders.

The reference wires AWS by hand in Java; in a Spark-first engine every one
of those moves becomes session/catalog configuration. These builders are
pure (no AWS calls), so the exact key surface is unit-tested offline and
applied verbatim on a real cluster.

Reference parity map (SURVEY.md §2A #25-#26 and supporting config):

- Glue catalog init (``Main.java:46-53``,
  ``aig/AIGEventsTableCreator.java:131-145``: ``GlueCatalog.initialize``
  with warehouse + io-impl): :func:`glue_catalog_conf` emits the
  ``spark.sql.catalog.<name>`` keys for the Iceberg Spark catalog backed
  by Glue.
- S3/S3A scheme + credentials wiring (``aig/AIGEventsTableCreator
  .java:98-129``, ``aig/ConfigurationTest.java:49-81``,
  ``aig/SimpleConfigTest.java:41-48``): :func:`s3_conf` emits the
  ``fs.s3a.*`` Hadoop keys (both ``s3://`` and ``s3a://`` resolve to the
  S3A connector, the mapping the reference's config tests probe).
- per-tenant SSE-KMS encryption (``aig/AIGEventsTableCreator.java:40-62``
  tenant→alias map, ``:369-383`` per-tenant ``S3FileIO`` with
  ``s3.sse.type=kms``; ``HiddenPartitionLoaderWithKMS.java:52-64``):
  :class:`TenantKMSRouter` resolves a tenant to the writer options that
  make its files land SSE-KMS-encrypted under its own key. One writer
  (or one ``foreachBatch`` branch) per tenant — encryption context is a
  file-level property, so tenants cannot share a write.
- Hive-style key layout (``HiddenPartitionLoaderWithKMS.java:194-207``
  builds ``tenants=<t>/year=.../file.parquet`` by hand): partitioned
  writes produce exactly this layout; nothing to configure.

None of this executes without AWS credentials; tests assert the dict
contents only (the reference's own ``ConfigurationTest`` is likewise a
config-sniffing test, not an AWS integration test).
"""

from __future__ import annotations

DEFAULT_REGION = "us-east-1"


def glue_catalog_conf(
    catalog: str = "lake",
    warehouse: str = "s3://example-bucket/warehouse",
    region: str = DEFAULT_REGION,
) -> dict[str, str]:
    """Spark conf for an Iceberg catalog backed by AWS Glue
    (≙ ``Main.java:46-53``'s ``GlueCatalog`` + ``S3FileIO`` setup)."""
    p = f"spark.sql.catalog.{catalog}"
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        p: "org.apache.iceberg.spark.SparkCatalog",
        f"{p}.catalog-impl": "org.apache.iceberg.aws.glue.GlueCatalog",
        f"{p}.warehouse": warehouse,
        f"{p}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
        f"{p}.client.region": region,
    }


def s3_conf(region: str = DEFAULT_REGION) -> dict[str, str]:
    """Hadoop conf wiring both ``s3://`` and ``s3a://`` to the S3A
    connector (≙ ``aig/AIGEventsTableCreator.java:98-129`` and the
    scheme-mapping checks in ``aig/ConfigurationTest.java``/
    ``SimpleConfigTest.java``). Credentials come from the default provider
    chain — never inline keys."""
    return {
        "spark.hadoop.fs.s3.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.endpoint.region": region,
        "spark.hadoop.fs.s3a.aws.credentials.provider": (
            "software.amazon.awssdk.auth.credentials.DefaultCredentialsProvider"
        ),
    }


class TenantKMSRouter:
    """Tenant → KMS key routing for per-tenant encrypted writes
    (≙ ``aig/AIGEventsTableCreator.java:40-62,369-383``).

    The reference builds a fresh ``S3FileIO`` per tenant with
    ``s3.sse.type=kms`` + that tenant's key alias and writes the tenant's
    partition group through it. Spark-side, the same isolation is one
    partitioned write per tenant with tenant-specific write options —
    e.g. ``df.filter(tenant).write.options(**router.write_options(t))``
    or per-tenant Iceberg table properties. Unknown tenants fall back to
    the default key (the reference throws instead; a 100 TB pipeline
    should quarantine, not abort)."""

    def __init__(
        self,
        aliases: dict[str, str],
        default_alias: str = "alias/iceberg-default",
    ) -> None:
        self.aliases = dict(aliases)
        self.default_alias = default_alias

    def key_for(self, tenant: str) -> str:
        return self.aliases.get(tenant, self.default_alias)

    def fileio_properties(self, tenant: str) -> dict[str, str]:
        """Iceberg ``S3FileIO`` properties for this tenant's writer
        (the exact keys the reference sets at ``:375-380``)."""
        return {
            "s3.sse.type": "kms",
            "s3.sse.key": self.key_for(tenant),
        }

    def write_options(self, tenant: str) -> dict[str, str]:
        """Hadoop/S3A per-write options for plain parquet sinks."""
        return {
            "fs.s3a.encryption.algorithm": "SSE-KMS",
            "fs.s3a.encryption.key": self.key_for(tenant),
        }


def write_per_tenant(
    df,
    router: TenantKMSRouter,
    base_path: str,
    tenant_col: str = "tenant_id",
    fmt: str = "parquet",
) -> dict[str, dict]:
    """Executable per-tenant write routing — the Spark analogue of the
    reference's ``HiddenPartitionLoaderWithKMS.java:52-64,194-207`` (one
    ``S3FileIO`` per tenant; hand-built ``tenants=<t>/...`` key layout).

    Encryption context is a FILE-level property, so tenants cannot share
    a write: each tenant's slice goes through its own writer carrying its
    own SSE-KMS options, landing under ``<base>/tenants=<t>/``. The
    distinct-tenant list is driver-side by design — it is partition-value
    planning (the Iceberg-manifest analogue), bounded by tenant count,
    never by data size. On local/test filesystems the S3A encryption
    options are inert passthroughs, which is exactly what lets the
    routing logic be asserted offline.

    Returns a manifest {tenant: {"path": ..., "options": ...}} so callers
    (and tests) can audit which key each write was issued under.
    """
    from pyspark.sql import functions as F

    tenants = [r[0] for r in df.select(tenant_col).distinct().collect()]
    manifest: dict[str, dict] = {}
    for t in sorted(tenants):
        opts = router.write_options(str(t))
        path = f"{base_path}/tenants={t}"
        (
            df.filter(F.col(tenant_col) == t)
            .drop(tenant_col)  # hive-style: the key carries the value
            .write.options(**opts)
            .format(fmt)
            .mode("overwrite")
            .save(path)
        )
        manifest[str(t)] = {"path": path, "options": opts}
    return manifest
