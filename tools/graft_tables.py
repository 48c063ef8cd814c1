"""Shared testdata-table registry for the dev-tool gates (check.py and
oracle_audit.py): ONE list and ONE view-creation helper, so a new table
added to one gate cannot silently diverge the other. Dev tool only."""

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def create_views(con, sf_dir):
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
