"""spark-submit entry for the YAML loader front-end (sister-repo
CSVLoader config shape, reference examples/getting-started/
giss_2022_12.yml).

Usage:
    python jobs/load_csv_job.py --config path/to/load.yml \
        [--database-dir /warehouse] [--cores 8]

--database-dir overrides the config's database_dir; one of the two must
be set. Prints the written {resolution: table} map as JSON.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="load_csv_job")
    ap.add_argument("--config", required=True)
    ap.add_argument("--database-dir", default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from osc_geo_h3grid_srv_spark.engine import GeoMeshEngine, make_spark
    from osc_geo_h3grid_srv_spark.sources.loader import (LoaderConfig,
                                                         run_csv_loader)
    cfg = LoaderConfig.from_yaml(args.config)
    db = args.database_dir or cfg.database_dir
    if not db:
        raise SystemExit("Error: set --database-dir or database_dir in "
                         "the config")
    spark = make_spark(cores=args.cores,
                       extra_conf={"spark.ui.enabled": "false"})
    engine = GeoMeshEngine(spark, db)
    tables = run_csv_loader(engine, cfg)
    print(json.dumps({str(k): v for k, v in tables.items()}))
    return tables


if __name__ == "__main__":
    main()
