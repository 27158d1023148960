"""Minimal stdlib xlsx codec (zip + SpreadsheetML XML) — no openpyxl.

Makes the reference's most common entry point — Excel workbooks
(ETL - CRM.py:67-76, ETL - Venda B2B.py:119, Utilitário - Juntar Abas
em Arquivo Único.py:19-39) — executable end-to-end in a container with
no xlsx library: ``read_sheet``/``read_all_sheets`` parse
sharedStrings + worksheet XML; ``write_xlsx`` emits a workbook with
inline strings that Excel/openpyxl/pandas can open.

Scope (deliberate): values are str/float/bool/None; dates arrive as
Excel serial numbers (callers convert with ``excel_serial_to_date``);
formulas yield their cached value; styles are ignored on READ.  The
engine-side contract — sheet iteration order, header promotion, sparse
cells as None — is what the readers/writers build on.

The WRITE side supports the presentation features the reference's
report sinks rely on (EDA - Faturamento.py:87-123, Base de Produtos
Mais Vendidos.py:101-148): per-column number formats (e.g. pt-BR money
``#,##0.00``), explicit column widths, and a bold header row — emitted
as a standard ``xl/styles.xml`` part plus ``<cols>`` records.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from datetime import date, timedelta

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {
    "r": "http://schemas.openxmlformats.org/package/2006/relationships",
}
_R_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, …, 'AA'→26 (cell reference column part)."""
    m = _CELL_REF.match(ref)
    letters = m.group(1) if m else "A"
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def excel_serial_to_date(serial: float) -> date:
    """Excel 1900-epoch serial number → date (day 1 = 1900-01-01).

    Excel inherited Lotus 1-2-3's fictitious 1900-02-29 (serial 60),
    so serials ≥ 61 are offset by one relative to the real calendar:
    the flat ``1899-12-30 + serial`` base is only correct there.
    Serials 1–59 (1900-01-01 … 1900-02-28) need base 1899-12-31, and
    serial 60 — a date that never existed — clamps to 1900-02-28
    (the convention openpyxl/LibreOffice use when reading)."""
    s = int(serial)
    if s < 60:
        return date(1899, 12, 31) + timedelta(days=s)
    if s == 60:
        return date(1900, 2, 28)
    return date(1899, 12, 30) + timedelta(days=s)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        xml = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(xml)
    out = []
    for si in root.findall("m:si", _NS):
        # either one <t> or rich-text runs <r><t>…
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall("r:Relationship", _REL_NS)
    }
    out = []
    for sh in wb.find("m:sheets", _NS).findall("m:sheet", _NS):
        target = rid_to_target[sh.get(_R_ATTR)]
        if not target.startswith("/"):
            target = "xl/" + target
        out.append((sh.get("name"), target.lstrip("/")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        return "".join(
            el.text or "" for el in is_el.iter(f"{{{_NS['m']}}}t")
        ) if is_el is not None else None
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    try:
        return float(v.text)
    except ValueError:  # defensive: malformed numeric cell
        return v.text


def _read_rows(zf: zipfile.ZipFile, path: str, shared: list[str]) -> list[list]:
    root = ET.fromstring(zf.read(path))
    data = root.find("m:sheetData", _NS)
    rows: list[list] = []
    width = 0
    for row in data.findall("m:row", _NS) if data is not None else []:
        cells: dict[int, object] = {}
        for c in row.findall("m:c", _NS):
            cells[_col_index(c.get("r", "A1"))] = _cell_value(c, shared)
        w = max(cells) + 1 if cells else 0
        width = max(width, w)
        rows.append([cells.get(i) for i in range(w)])
    return [r + [None] * (width - len(r)) for r in rows]


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [name for name, _ in _sheet_paths(zf)]


def read_sheet(path: str, sheet: str | int = 0) -> tuple[list[str], list[list]]:
    """One sheet → (header, data_rows).  First row is the header
    (reference convention); sparse/missing cells are None.  Note: cell
    text round-trips exactly EXCEPT carriage returns — the XML parser
    normalizes \r\n and bare \r to \n per the XML spec's end-of-line
    handling (pinned by the codec fuzz property test)."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_paths(zf)
        if isinstance(sheet, int):
            if not 0 <= sheet < len(sheets):
                raise IndexError(
                    f"sheet index {sheet} out of range; workbook has "
                    f"{len(sheets)} sheet(s): {[n for n, _ in sheets]}"
                )
            name, target = sheets[sheet]
        else:
            match = [(n, t) for n, t in sheets if n == sheet]
            if not match:
                raise KeyError(
                    f"sheet {sheet!r} not in workbook; available: "
                    f"{[n for n, _ in sheets]}"
                )
            name, target = match[0]
        rows = _read_rows(zf, target, _shared_strings(zf))
    if not rows:
        return [], []
    header = [str(v) if v is not None else f"col_{i}" for i, v in enumerate(rows[0])]
    return header, rows[1:]


def read_sheet_raw(path, sheet: str | int = 0) -> list[list]:
    """All rows of one sheet WITHOUT header promotion — for callers
    that must DISCOVER the header row themselves (ref Algoritmo de
    Varredura - Planilhas.py:33-36 reads ``header=None, nrows=50``)."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_paths(zf)
        if isinstance(sheet, int):
            name, target = sheets[sheet]
        else:
            (target,) = [t for n, t in sheets if n == sheet]
        return _read_rows(zf, target, _shared_strings(zf))


def read_all_sheets(path: str) -> dict[str, tuple[list[str], list[list]]]:
    """Every sheet in workbook order → {name: (header, rows)}."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        return {
            name: (
                lambda rs: (
                    [
                        str(v) if v is not None else f"col_{i}"
                        for i, v in enumerate(rs[0])
                    ]
                    if rs
                    else [],
                    rs[1:] if rs else [],
                )
            )(_read_rows(zf, target, shared))
            for name, target in _sheet_paths(zf)
        }


# ---------------------------------------------------------------------------
# Writer (S9): header + rows per sheet, inline strings, no styles
# ---------------------------------------------------------------------------

_XML_INVALID = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _esc(s: str, attr: bool = False) -> str:
    """XML-escape text; ``attr=True`` additionally escapes double
    quotes (sheet names land inside attribute values, and quotes are
    legal in Excel sheet names).  XML-1.0-invalid control characters
    (possible in scraped document text) are replaced with U+FFFD —
    emitting them verbatim would corrupt the workbook."""
    s = _XML_INVALID.sub("�", s)
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s.replace('"', "&quot;") if attr else s


def _col_ref(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def _sheet_xml(
    header: list[str],
    rows: list[list],
    col_styles: dict[int, int] | None = None,
    widths: dict[int, float] | None = None,
    header_style: int = 0,
    has_drawing: bool = False,
) -> str:
    """Worksheet XML.  ``col_styles`` maps column index → cellXfs
    style index applied to every DATA cell of that column (the header
    row gets ``header_style``); ``widths`` maps column index → Excel
    character width, emitted as ``<cols>`` records."""
    col_styles = col_styles or {}

    def cell(ref: str, v, s: int) -> str:
        import decimal

        attr = f' s="{s}"' if s else ""
        if v is None:
            return f'<c r="{ref}"{attr}/>' if s else ""
        if isinstance(v, bool):
            return f'<c r="{ref}"{attr} t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float, decimal.Decimal)):
            # Decimal renders via str() — exact digits, no float detour
            # (money columns arrive as decimal.Decimal from Spark rows)
            return f'<c r="{ref}"{attr}><v>{v}</v></c>'
        return (
            f'<c r="{ref}"{attr} t="inlineStr">'
            f'<is><t xml:space="preserve">{_esc(str(v))}</t></is></c>'
        )

    body = []
    for rn, row in enumerate([header] + [list(r) for r in rows], start=1):
        cells = "".join(
            cell(
                f"{_col_ref(ci)}{rn}",
                v,
                header_style if rn == 1 else col_styles.get(ci, 0),
            )
            for ci, v in enumerate(row)
        )
        body.append(f'<row r="{rn}">{cells}</row>')
    cols_xml = ""
    if widths:
        cols_xml = "<cols>" + "".join(
            f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
            for i, w in sorted(widths.items())
        ) + "</cols>"
    # the sheet's rels part holds only the drawing relationship → rId1
    drawing_xml = '<drawing r:id="rId1"/>' if has_drawing else ""
    r_ns = (
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
        if has_drawing
        else ""
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS["m"]}"{r_ns}>'
        + cols_xml
        + "<sheetData>"
        + "".join(body)
        + "</sheetData>"
        + drawing_xml
        + "</worksheet>"
    )


_EMU_PER_PX = 9525  # English Metric Units per CSS pixel (96 dpi)


def _drawing_xml(anchors: list[dict]) -> str:
    """drawing{k}.xml: one ``oneCellAnchor`` picture per image spec,
    anchored at the spec's cell with a fixed pixel extent (ref
    Base de Produtos Mais Vendidos.py:139-145 anchors 100×100 product
    photos at column D cells)."""
    xdr = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    parts = [f'<xdr:wsDr xmlns:xdr="{xdr}" xmlns:a="{a}" xmlns:r="{r}">']
    for k, spec in enumerate(anchors):
        m = _CELL_REF.match(spec["cell"].upper())
        col = _col_index(spec["cell"].upper())
        row = int(m.group(2)) - 1 if m else 0
        cx = int(spec.get("width", 100)) * _EMU_PER_PX
        cy = int(spec.get("height", 100)) * _EMU_PER_PX
        parts.append(
            "<xdr:oneCellAnchor>"
            f"<xdr:from><xdr:col>{col}</xdr:col><xdr:colOff>0</xdr:colOff>"
            f"<xdr:row>{row}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>"
            f'<xdr:ext cx="{cx}" cy="{cy}"/>'
            "<xdr:pic><xdr:nvPicPr>"
            f'<xdr:cNvPr id="{k + 1}" name="img{k + 1}"/><xdr:cNvPicPr/>'
            "</xdr:nvPicPr><xdr:blipFill>"
            f'<a:blip r:embed="rId{k + 1}"/><a:stretch><a:fillRect/></a:stretch>'
            "</xdr:blipFill><xdr:spPr>"
            '<a:prstGeom prst="rect"><a:avLst/></a:prstGeom>'
            "</xdr:spPr></xdr:pic><xdr:clientData/>"
            "</xdr:oneCellAnchor>"
        )
    parts.append("</xdr:wsDr>")
    return '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>' + "".join(parts)


def _styles_xml(num_formats: list[str]) -> str:
    """styles.xml with font 0 (default) + font 1 (bold header), and
    one cellXf per custom number format.  cellXfs layout: index 0 =
    default, 1 = bold header, 2+k = numFmt k (id 164+k — custom format
    ids start at 164 in SpreadsheetML)."""
    numfmts = "".join(
        f'<numFmt numFmtId="{164 + k}" formatCode="{_esc(code, attr=True)}"/>'
        for k, code in enumerate(num_formats)
    )
    fmt_xfs = "".join(
        f'<xf numFmtId="{164 + k}" fontId="0" fillId="0" borderId="0" '
        'applyNumberFormat="1"/>'
        for k in range(len(num_formats))
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_NS["m"]}">'
        f'<numFmts count="{len(num_formats)}">{numfmts}</numFmts>'
        '<fonts count="2"><font/><font><b/></font></fonts>'
        '<fills count="2"><fill><patternFill patternType="none"/></fill>'
        '<fill><patternFill patternType="gray125"/></fill></fills>'
        '<borders count="1"><border/></borders>'
        '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
        f'<cellXfs count="{2 + len(num_formats)}">'
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'
        '<xf numFmtId="0" fontId="1" fillId="0" borderId="0" applyFont="1"/>'
        + fmt_xfs
        + "</cellXfs></styleSheet>"
    )


def write_xlsx(
    path: str,
    sheets: dict[str, tuple[list[str], list[list]]],
    styles: dict[str, dict] | None = None,
    images: dict[str, list[dict]] | None = None,
) -> None:
    """Write {sheet_name: (header, rows)} as a minimal valid xlsx.

    ``styles`` (optional) maps sheet name → spec with any of:

    - ``"formats"``: {header_name: number-format code} — e.g.
      ``{"valor": "#,##0.00"}`` applies the money format to every data
      cell of that column (ref EDA - Faturamento.py:87-123);
    - ``"widths"``: {header_name: width} — Excel character widths,
      emitted as customWidth ``<cols>`` records;
    - ``"bold_header"``: bool (default True when a spec is present) —
      bold font on row 1.

    ``images`` (optional) maps sheet name → list of image specs
    ``{"cell": "D3", "data": <png/jpeg bytes>, "ext": "png",
    "width": 100, "height": 100}`` — each embedded as a
    ``oneCellAnchor`` picture at that cell (ref Base de Produtos Mais
    Vendidos.py:139-145, 100×100 product photos anchored per row).

    When any sheet has a spec, a standard ``xl/styles.xml`` part is
    emitted; otherwise the workbook is byte-identical to before.
    """
    names = list(sheets)
    styles = styles or {}
    images = images or {}
    # collect the distinct format codes across sheets → numFmt ids
    fmt_codes: list[str] = []
    for spec in styles.values():
        for code in (spec.get("formats") or {}).values():
            if code not in fmt_codes:
                fmt_codes.append(code)
    has_styles = bool(styles)
    # sheets with images, in workbook order → drawing part numbers
    drawing_of = {
        n: k + 1 for k, n in enumerate(n for n in names if images.get(n))
    }
    img_exts = sorted(
        {
            (spec.get("ext") or "png").lower().lstrip(".")
            for specs in images.values()
            for spec in specs
        }
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        + "".join(
            f'<Default Extension="{e}" ContentType="image/{"jpeg" if e in ("jpg", "jpeg") else e}"/>'
            for e in img_exts
        )
        + '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + (
            '<Override PartName="/xl/styles.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
            if has_styles
            else ""
        )
        + "".join(
            f'<Override PartName="/xl/drawings/drawing{k}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.drawing+xml"/>'
            for k in drawing_of.values()
        )
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS["r"]}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    wb_sheets = "".join(
        f'<sheet name="{_esc(n, attr=True)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS["m"]}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS["r"]}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + (
            f'<Relationship Id="rId{len(names) + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
            'Target="styles.xml"/>'
            if has_styles
            else ""
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        if has_styles:
            zf.writestr("xl/styles.xml", _styles_xml(fmt_codes))
        rel_type = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
        img_no = 0
        for i, n in enumerate(names):
            header, rows = sheets[n]
            spec = styles.get(n) or {}
            col_of = {h: ci for ci, h in enumerate(header)}
            col_styles = {
                col_of[h]: 2 + fmt_codes.index(code)
                for h, code in (spec.get("formats") or {}).items()
                if h in col_of
            }
            widths = {
                col_of[h]: w
                for h, w in (spec.get("widths") or {}).items()
                if h in col_of
            }
            header_style = 1 if spec.get("bold_header", bool(spec)) else 0
            dk = drawing_of.get(n)
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(
                    header, rows, col_styles, widths, header_style,
                    has_drawing=dk is not None,
                ),
            )
            if dk is None:
                continue
            anchors = images[n]
            zf.writestr(
                f"xl/worksheets/_rels/sheet{i + 1}.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<Relationships xmlns="{_REL_NS["r"]}">'
                f'<Relationship Id="rId1" Type="{rel_type}/drawing" '
                f'Target="../drawings/drawing{dk}.xml"/></Relationships>',
            )
            zf.writestr(f"xl/drawings/drawing{dk}.xml", _drawing_xml(anchors))
            draw_rels = []
            for k, img in enumerate(anchors):
                img_no += 1
                ext = (img.get("ext") or "png").lower().lstrip(".")
                media = f"image{img_no}.{ext}"
                zf.writestr(f"xl/media/{media}", img["data"])
                draw_rels.append(
                    f'<Relationship Id="rId{k + 1}" Type="{rel_type}/image" '
                    f'Target="../media/{media}"/>'
                )
            zf.writestr(
                f"xl/drawings/_rels/drawing{dk}.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<Relationships xmlns="{_REL_NS["r"]}">'
                + "".join(draw_rels)
                + "</Relationships>",
            )
