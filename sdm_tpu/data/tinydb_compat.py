"""Reader for TinyDB's JSON storage format (no tinydb dependency).

The reference's labelled datasets are TinyDB files
(/root/reference/custom_dataset/conditional_img_dataset.py:18-26,
doodle_dataset.py:21-27): a JSON document of
`{"<table>": {"<doc_id>": {...row...}, ...}, ...}`. This parses the same
files directly with the stdlib json module, returning rows in doc-id order
(matching tinydb's `table.all()`).
"""

from __future__ import annotations

import json
from typing import Dict, List


def read_tables(dataset_path: str) -> Dict[str, List[dict]]:
    with open(dataset_path, "r") as f:
        doc = json.load(f)
    tables: Dict[str, List[dict]] = {}
    for table_name, rows in doc.items():
        ordered = sorted(rows.items(), key=lambda kv: int(kv[0]))
        tables[table_name] = [row for _, row in ordered]
    return tables


def write_tables(dataset_path: str, tables: Dict[str, List[dict]]) -> None:
    """Inverse of read_tables (used by tests/fixtures); writes a TinyDB-
    compatible JSON document."""
    doc = {name: {str(i + 1): row for i, row in enumerate(rows)}
           for name, rows in tables.items()}
    with open(dataset_path, "w") as f:
        json.dump(doc, f)
