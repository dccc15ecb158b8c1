"""spark-submit entrypoint: thin shim so --py-files carries the package.

    spark-submit --py-files dist/psdv_spark.zip jobs/run_validation.py \
        --config validation.yaml --source-path ... --target-path ...
"""
import sys

from professional_services_data_validator_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
