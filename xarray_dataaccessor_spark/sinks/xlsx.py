"""Minimal pure-Python .xlsx writer (stdlib zipfile + XML).

The reference exports extracted tables to Excel through
``pandas.to_excel`` / openpyxl (``utility_functions.py:506-516``); this
container has no openpyxl, and the format itself is just a zip of small
XML parts (ECMA-376 / ISO 29500 SpreadsheetML — public spec), so the
sink writes them directly:

- ``[Content_Types].xml``, ``_rels/.rels``       — package plumbing
- ``xl/workbook.xml`` + its rels                 — one sheet
- ``xl/worksheets/sheet1.xml``                   — the data

Strings are written as inline strings (no sharedStrings table), numbers
as native numeric cells, booleans as boolean cells, timestamps/other
objects as ISO text — deterministic output, bounded driver-side tables
only (the same contract as the reference's xlsx path).
"""

from __future__ import annotations

import zipfile
from pathlib import Path
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, …, Z, AA, …"""
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(65 + rem) + letters
    return letters


def _cell_xml(ref: str, value) -> str:
    import math

    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_xlsx(pdf, path: str | Path) -> Path:
    """Write a pandas DataFrame to ``path`` as a single-sheet .xlsx
    (header row + data rows). Returns the path."""
    import numpy as np
    import pandas as pd

    def _plain(v):
        # pd.isna catches None, float NaN, AND pd.NaT (which would
        # otherwise fall through to the text branch as the string 'NaT')
        if v is None or (np.isscalar(v) or isinstance(v, type(pd.NaT))) and pd.isna(v):
            return None
        if isinstance(v, (bool, np.bool_)):
            return bool(v)
        if isinstance(v, (int, np.integer)):
            return int(v)
        if isinstance(v, (float, np.floating)):
            return float(v)
        return v

    rows_xml: list[str] = []
    header = [
        _cell_xml(f"{_col_letter(c)}1", str(name)) for c, name in enumerate(pdf.columns)
    ]
    rows_xml.append(f'<row r="1">{"".join(header)}</row>')
    # column-wise scalar access (iat) preserves each column's dtype —
    # iterrows() would upcast every row to one common dtype, turning
    # bigint ids into floats in all-numeric frames
    ncols = len(pdf.columns)
    for r in range(len(pdf)):
        cells = [
            _cell_xml(f"{_col_letter(c)}{r + 2}", _plain(pdf.iat[r, c]))
            for c in range(ncols)
        ]
        rows_xml.append(f'<row r="{r + 2}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    path = Path(path)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
