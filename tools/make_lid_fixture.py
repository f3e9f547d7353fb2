"""Generate the committed fastText-format lid fixture
(fixtures/models/lid_tiny_ft.bin) — deterministic, no RNG, rebuildable
bit-identically from the LangIdModelActor seed corpora.

Run from the repo root:  python tools/make_lid_fixture.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spiderray.functions.fasttext_io import build_lid_model, write_fasttext_bin
from spiderray.stages.langid_stage import LangIdModelActor


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "fixtures", "models", "lid_tiny_ft.bin")
    dict_data, input_mat, output_mat, _, _ = build_lid_model(
        LangIdModelActor._SEEDS)
    write_fasttext_bin(out, input_mat=input_mat, output_mat=output_mat,
                       **dict_data)
    digest = hashlib.md5(open(out, "rb").read()).hexdigest()
    print(f"{out}: {os.path.getsize(out)} bytes md5={digest}")


if __name__ == "__main__":
    main()
