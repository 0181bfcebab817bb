"""Console entry point: ``python -m whisper_pandas_spark PATH [PATH ...]``.

Prints file + archive metadata tables (reference CLI:
``whisper-pandas PATH`` → whisper_pandas.py:288-295). Header-only read —
no Spark session, no data scan.
"""

from __future__ import annotations

import argparse

from whisper_pandas_spark.sources.meta import print_info


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="whisper-pandas-spark", description="Whisper file info"
    )
    parser.add_argument("paths", nargs="+", help="Whisper .wsp / .wsp.gz files")
    parser.add_argument(
        "--compression", default="infer", choices=("infer", "none", "gzip")
    )
    args = parser.parse_args(argv)
    for i, path in enumerate(args.paths):
        if i:
            print()
        print_info(path, args.compression)


if __name__ == "__main__":
    main()
