"""Pipeline assembly (gather/fetch/import DAG) and diff-sync engine."""
