"""``python -m dataflow_flex_pyarrow_to_gds_spark`` → the graph-load CLI."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
