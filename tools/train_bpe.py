"""Train the committed BPE merges table (functions/bpe.py) over the
sf0.01 documents corpus. Deterministic — rerunning over the same corpus
reproduces resources/bpe_merges.txt byte-for-byte.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from granulate_char_ocr_spark.functions import bpe


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else bpe.N_MERGES
    rows = duckdb.sql(
        f"SELECT text FROM '{os.path.join(sf_dir, 'documents.parquet')}' "
        "ORDER BY doc_id"
    ).fetchall()
    merges = bpe.train_bpe([r[0] for r in rows], n_merges)
    bpe.save_merges(merges)
    print(f"wrote {len(merges)} merges to {bpe.MERGES_PATH}")


if __name__ == "__main__":
    main()
