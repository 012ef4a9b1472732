"""Class label maps (dimension fixtures).

- ``DOCLAYNET_11``: doclayout_yolo/cfg/datasets/doclaynet.yaml:17-28.
- ``DOCSTRUCTBENCH_10``: the 10-class map carried inside the released
  DocStructBench checkpoint referenced at README.md:94 (class names
  travel in the model file per engine/model.py:717-729); pinned here
  explicitly.  ``abandon`` is the boilerplate class the north star
  filters out.
"""

from __future__ import annotations

DOCLAYNET_11: dict[int, str] = {
    0: "Caption",
    1: "Footnote",
    2: "Formula",
    3: "List-item",
    4: "Page-footer",
    5: "Page-header",
    6: "Picture",
    7: "Section-header",
    8: "Table",
    9: "Text",
    10: "Title",
}

DOCSTRUCTBENCH_10: dict[int, str] = {
    0: "title",
    1: "plain text",
    2: "abandon",
    3: "figure",
    4: "figure_caption",
    5: "table",
    6: "table_caption",
    7: "table_footnote",
    8: "isolate_formula",
    9: "formula_caption",
}

ABANDON_CLS = 2  # DOCSTRUCTBENCH_10 id for boilerplate regions
NC = len(DOCSTRUCTBENCH_10)
