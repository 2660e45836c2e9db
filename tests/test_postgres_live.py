"""Live PostgreSQL integration: the real dialect the reference runs
against (``docker/postgres/init.sql:1-37`` seeds a sample tenant DB;
``connectors/postgresql.py:4-14`` is its connector).

This container ships Postgres 15 server binaries but no pgjdbc jar and
no network to fetch one (re-verified r9, 2026-08-15: curl to
repo1.maven.org exits 6, could not resolve host), so the tests split
honestly:

- a throwaway local server (initdb + pg_ctl as the ``postgres`` user)
  certifies, via psql, the exact SQL forms our extract path pushes to
  a Postgres source: the quoted-identifier bounds probe
  (``reader.bounds_probe_sql``) and the projection + tenant-equality +
  incremental-range + LIMIT pushdown shape (``reader.extract_table``
  semantics, Spark-generated WHERE forms);
- the full Spark-JDBC round-trip runs only when a pgjdbc jar is
  discoverable (``SPARK_GRAFT_PGJDBC_JAR`` or common glob locations)
  and skips with an explicit reason otherwise — on a jar-equipped
  cluster it exercises the same ``extract_table`` path the embedded
  Derby test certifies here (``tests/test_backends.py``).
"""

from __future__ import annotations

import glob
import os
import shutil
import socket
import subprocess

import pytest

from mozart_etl_spark.config import SourceConfig
from mozart_etl_spark.sources import reader as R

PG_USER = "pg"
PG_DB = "tenant_src"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _as_pg(cmd: str) -> subprocess.CompletedProcess:
    """Run a shell command as the postgres system user when root
    (the server refuses to start under uid 0). cd to /tmp first — su
    keeps the caller's cwd, which postgres cannot read."""
    if os.geteuid() == 0:
        cmd = f"su postgres -s /bin/sh -c {('cd /tmp && ' + cmd)!r}"
    return subprocess.run(cmd, shell=True, capture_output=True, text=True, timeout=120)


@pytest.fixture(scope="module")
def pg_server():
    for tool in ("initdb", "pg_ctl", "psql"):
        if shutil.which(tool) is None:
            pytest.skip(f"postgres binaries not installed ({tool} missing)")
    # NOT pytest's tmp_path: its /tmp/pytest-of-root ancestors are 0700,
    # untraversable by the postgres user the server must run as
    import tempfile

    base_s = tempfile.mkdtemp(prefix="pglive_", dir="/tmp")
    os.chmod(base_s, 0o777)
    import pathlib

    base = pathlib.Path(base_s)
    data = base / "data"
    port = _free_port()
    r = _as_pg(f"initdb -D {data} -U {PG_USER} --auth=trust -E UTF8")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _as_pg(
        f"pg_ctl -D {data} -w -t 60 -l {base}/pg.log "
        f"-o '-c listen_addresses=127.0.0.1 -c port={port} "
        f"-c unix_socket_directories={base}' start"
    )
    if r.returncode != 0:
        pytest.skip(f"postgres failed to start: {r.stderr[-300:]}")
    try:
        # argv list, NOT a shell string: a shell would strip the
        # double-quoted identifiers out of the SQL before psql sees
        # them, silently certifying the UNquoted dialect forms
        run = lambda sql, db=PG_DB: subprocess.run(  # noqa: E731
            [
                "psql", "-h", "127.0.0.1", "-p", str(port), "-U", PG_USER,
                "-X", "-q", "-t", "-A", "-d", db, "-c", sql,
            ],
            capture_output=True, text=True, timeout=60,
        )
        created = run(f"CREATE DATABASE {PG_DB}", db="postgres")
        assert created.returncode == 0, created.stderr
        # same shape as the reference's sample tenant DB
        # (docker/postgres/init.sql): SERIAL pks, DECIMAL(10,2) money,
        # TIMESTAMP audit columns, child orders referencing customers —
        # plus a multi-tenant items table for the extract-path filters
        seed = """
            CREATE TABLE customers (
                id SERIAL PRIMARY KEY,
                name VARCHAR(255) NOT NULL,
                email VARCHAR(255),
                created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
            );
            CREATE TABLE orders (
                order_id SERIAL PRIMARY KEY,
                customer_id INTEGER REFERENCES customers(id),
                amount DECIMAL(10, 2),
                status VARCHAR(50) DEFAULT 'pending'
            );
            INSERT INTO customers (name, email)
            SELECT 'cust_' || g, 'c' || g || '@example.com'
            FROM generate_series(1, 5) g;
            INSERT INTO orders (customer_id, amount, status)
            SELECT 1 + (g % 5), (g * 7)::DECIMAL(10,2) / 4,
                   CASE WHEN g % 3 = 0 THEN 'completed' ELSE 'pending' END
            FROM generate_series(1, 40) g;
            CREATE TABLE items (
                id INTEGER PRIMARY KEY,
                tenant_id VARCHAR(20),
                name VARCHAR(50),
                updated_at INTEGER
            );
            INSERT INTO items
            SELECT g, 't' || (g % 3), 'name_' || g, g * 10
            FROM generate_series(1, 100) g;
        """
        seeded = run(seed)
        assert seeded.returncode == 0, seeded.stderr
        # prove the argv path preserves quoted identifiers: the
        # mixed-case column reference resolves only if Postgres
        # received the double quotes (unquoted it case-folds and
        # errors), so quote-stripping would fail this probe
        probe = run('SELECT "MiXeD" FROM (SELECT 2 AS "MiXeD") q')
        assert probe.returncode == 0 and probe.stdout.strip() == "2", probe.stderr
        yield {"port": port, "run": run}
    finally:
        _as_pg(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(base_s, ignore_errors=True)


def test_bounds_probe_sql_on_live_postgres(pg_server):
    """The exact probe statement jdbc_bounds pushes (quoted
    identifiers, lo/hi aliases) runs on a real Postgres and returns
    the true min/max — certifying the dialect form the Derby test can
    only approximate."""
    src = SourceConfig(type="postgresql", host="127.0.0.1", database=PG_DB)
    sql = R.bounds_probe_sql(src, "items", "id")
    assert sql == 'SELECT MIN("id") AS lo, MAX("id") AS hi FROM items'
    out = pg_server["run"](sql)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "1|100"


def test_extract_pushdown_forms_on_live_postgres(pg_server):
    """The WHERE/LIMIT forms Spark pushes for our extract_table plan
    (projection + tenant equality + incremental range + LIMIT, quoted
    identifiers) are valid Postgres and select the same rows the
    embedded-Derby round-trip pins (tests/test_backends.py: 24 rows
    for tenant t1 past watermark 300)."""
    pushed = (
        'SELECT "id","name","updated_at" FROM items '
        "WHERE (\"tenant_id\" = 't1') AND (\"updated_at\" > 300)"
    )
    out = pg_server["run"](f"SELECT count(*) FROM ({pushed}) q")
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "24"
    limited = pg_server["run"](f"{pushed} ORDER BY \"id\" LIMIT 5")
    assert limited.returncode == 0, limited.stderr
    assert [line.split("|")[0] for line in limited.stdout.strip().splitlines()] == [
        "31", "34", "37", "40", "43",
    ]


def test_decimal_and_fk_shape_on_live_postgres(pg_server):
    """DECIMAL(10,2) arithmetic and the join-shaped sample schema
    (orders.customer_id -> customers.id) behave as the mart models
    assume (docker/postgres/init.sql:12-14; SURVEY §2.3 E5)."""
    out = pg_server["run"](
        "SELECT c.name, SUM(o.amount * 1.1) FROM orders o "
        "JOIN customers c ON o.customer_id = c.id "
        "GROUP BY c.name ORDER BY c.name LIMIT 1"
    )
    assert out.returncode == 0, out.stderr
    name, total = out.stdout.strip().split("|")
    assert name == "cust_1" and float(total) > 0


def _find_pgjdbc_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_PGJDBC_JAR")
    if env and os.path.exists(env):
        return env
    for pattern in (
        "/opt/jars/postgresql-*.jar",
        "/usr/share/java/postgresql*.jar",
        os.path.expanduser("~/.ivy2/jars/*postgresql*.jar"),
    ):
        hits = glob.glob(pattern)
        if hits:
            return sorted(hits)[-1]
    return None


def test_spark_jdbc_roundtrip_live_postgres(pg_server, spark):
    """Full extract_table round-trip over Spark's JDBC source against
    the live server — pushdown + probed-bounds parallel read, the same
    assertions the Derby twin makes. Needs the pgjdbc driver jar on
    the session classpath; this container has none and no network, so
    it skips here and runs on any jar-equipped deployment."""
    jar = _find_pgjdbc_jar()
    if jar is None:
        pytest.skip(
            "no postgresql JDBC jar found (set SPARK_GRAFT_PGJDBC_JAR); "
            "Spark-side JDBC semantics are certified against embedded "
            "Derby in tests/test_backends.py"
        )
    from mozart_etl_spark.config import TableSpec

    src = SourceConfig(
        type="postgresql",
        host="127.0.0.1",
        port=pg_server["port"],
        database=PG_DB,
        user=PG_USER,
        options={"driver": "org.postgresql.Driver"},
    )
    spec = TableSpec(
        name="items",
        columns=("id", "name", "updated_at"),
        tenant_filter="tenant_id",
        incremental_column="updated_at",
        partition_column="id",
        num_partitions=4,
    )
    out = R.extract_table(spark, src, spec, tenant_filter_value="t1", last_value=300)
    assert out.count() == 24
    assert out.rdd.getNumPartitions() == 4
