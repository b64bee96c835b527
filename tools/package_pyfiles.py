"""Build ``dist/csvw_rdf_convertor_spark.zip`` for ``spark-submit --py-files``.

Deterministic: fixed timestamps and sorted entries, so the artifact hash is
stable for a given tree (reproducible deploys; cluster-side caches keyed on
content hash don't churn).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "csvw_rdf_convertor_spark"
DIST = REPO / "dist"


def build(out: Path | None = None) -> Path:
    out = out or DIST / "csvw_rdf_convertor_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)),
                                   date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes(), zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    print(build())
