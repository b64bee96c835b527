"""spark-submit shim: the package arrives via ``--py-files`` (see
``tools/package_pyfiles.py``); this file is the script argument.

    spark-submit --py-files dist/csvw_rdf_convertor_spark.zip \\
        jobs/kg_construct.py --synth 200 --output /tmp/kg
"""
import sys

from csvw_rdf_convertor_spark.jobs.kg_construct import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
