"""OMML (Office Math Markup Language) → LaTeX.

Own implementation of the conversion surface the reference vendors from the
public dwml project (``/root/reference/docling/backend/docx/latex/omml.py``):
a recursive walk over ``m:`` elements emitting LaTeX for fractions,
scripts, n-ary operators, delimiters, radicals, functions and equation
arrays, with the same whitespace conventions for unicode symbol
substitution (ensuremath-style spacing, ``\\text{...}`` wrapping of text
-mode symbols) so converted formulas match the reference byte-for-byte.
"""

from __future__ import annotations

from typing import Optional
from xml.etree import ElementTree as ET

M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

_ESCAPE_CHARS = set("{}_^#&$%~")

# unicode → latex, with the spacing the reference's unicode-encoder pipeline
# produces (math symbols gain double spaces from ensuremath unwrapping; text
# -mode symbols get a \text{ ... } wrapper)
_MATH_SYMBOLS = {
    "π": "\\pi", "∞": "\\infty", "±": "\\pm",
    "α": "\\alpha", "β": "\\beta", "γ": "\\gamma",
    "θ": "\\theta", "λ": "\\lambda", "μ": "\\mu",
    "σ": "\\sigma", "φ": "\\varphi", "ω": "\\omega",
    "≠": "\\neq", "≤": "\\leq", "≥": "\\geq",
    "∈": "\\in", "→": "\\to", "÷": "\\div",
    "−": "-",
    # ASCII math-mode characters the reference's encoder wraps in
    # ensuremath, yielding the same double-space padding
    "<": "<", ">": ">",
}
_TEXT_SYMBOLS = {
    "×": "\\texttimes", "…": "\\textellipsis",
    "§": "\\S", "°": "\\textdegree",
}

_NARY_OPS = {
    "∑": "\\sum", "∏": "\\prod", "∐": "\\coprod",
    "∫": "\\int", "⋀": "\\bigwedge", "⋁": "\\bigvee",
    "⋂": "\\bigcap", "⋃": "\\bigcup",
}

_FRACTION_STYLES = {
    "bar": "\\frac{{{num}}}{{{den}}}",
    "skw": "^{{{num}}}/_{{{den}}}",
    "noBar": "\\genfrac{{}}{{}}{{0pt}}{{}}{{{num}}}{{{den}}}",
    "lin": "{{{num}}}/{{{den}}}",
}

_FUNC_NAMES = {name: f"\\{name}({{fe}})" for name in (
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arccot", "sinh",
    "cosh", "tanh", "coth", "sec", "csc", "cot", "log", "ln", "exp")}
_FUNC_PLACE = "{fe}"


def _prop_val(parent: ET.Element, pr_tag: str, prop: str) -> Optional[str]:
    pr = parent.find(f"{M}{pr_tag}")
    if pr is None:
        return None
    el = pr.find(f"{M}{prop}")
    if el is None:
        return None
    return el.get(f"{M}val")


def _escape(text: str, base: str) -> str:
    out = []
    last = ""
    for ch in text:
        if ch in _ESCAPE_CHARS and last != "\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
        last = ch
    result = "".join(out)
    # braces introduced by symbol substitution stay unescaped
    if "{" not in base and "\\{" in result:
        result = result.replace("\\{", "{")
    if "}" not in base and "\\}" in result:
        result = result.replace("\\}", "}")
    return result


def _run_latex(run: ET.Element) -> str:
    raw = run.findtext(f"./{M}t") or ""
    pieces = []
    for ch in raw:
        if ch in _MATH_SYMBOLS:
            pieces.append(f"  {_MATH_SYMBOLS[ch]}  ")
        elif ch in _TEXT_SYMBOLS:
            pieces.append(f" \\text{{ {_TEXT_SYMBOLS[ch]} }} ")
        else:
            pieces.append(ch)
    return _escape("".join(pieces), raw)


def _convert_children(elm: ET.Element, include: Optional[tuple] = None) -> str:
    parts = []
    for child in elm:
        if not child.tag.startswith(M):
            continue
        tag = child.tag[len(M):]
        if include is not None and tag not in include:
            continue
        part = _convert(child)
        if part is not None:
            parts.append(part)
    return "".join(parts)


def _convert(elm: ET.Element) -> Optional[str]:
    tag = elm.tag[len(M):]
    if tag == "r":
        return _run_latex(elm)
    if tag in ("box", "sSub", "sSup", "sSubSup", "num", "den", "deg", "e",
               "oMath"):
        return _convert_children(elm)
    if tag == "sub":
        return "_{" + _convert_children(elm) + "}"
    if tag == "sup":
        return "^{" + _convert_children(elm) + "}"
    if tag == "f":
        num = _convert_children(elm.find(f"{M}num")) if elm.find(f"{M}num") is not None else ""
        den = _convert_children(elm.find(f"{M}den")) if elm.find(f"{M}den") is not None else ""
        style = _prop_val(elm, "fPr", "type")
        template = _FRACTION_STYLES.get(style, _FRACTION_STYLES["bar"])
        return template.format(num=num, den=den)
    if tag == "d":
        beg = _prop_val(elm, "dPr", "begChr")
        end = _prop_val(elm, "dPr", "endChr")
        left = "(" if beg is None else (_escape(beg, beg) or ".")
        right = ")" if end is None else (_escape(end, end) or ".")
        body = _convert_children(elm, include=("e",))
        return f"\\left{left}{body}\\right{right}"
    if tag == "nary":
        op_char = _prop_val(elm, "naryPr", "chr")
        op = _NARY_OPS.get(op_char, "\\int") if op_char else "\\int"
        rest = _convert_children(elm, include=("sub", "sup", "e"))
        return op + rest
    if tag == "func":
        fname_el = elm.find(f"{M}fName")
        body = _convert_children(elm, include=("e",))
        fname = ""
        if fname_el is not None:
            raw = _convert_children(fname_el)
            fname = _FUNC_NAMES.get(raw, raw)
            if _FUNC_PLACE not in fname:
                fname += _FUNC_PLACE
        return fname.replace(_FUNC_PLACE, body)
    if tag == "rad":
        deg_el = elm.find(f"{M}deg")
        deg = _convert_children(deg_el) if deg_el is not None else ""
        body = _convert_children(elm, include=("e",))
        if deg:
            return f"\\sqrt[{deg}]{{{body}}}"
        return f"\\sqrt{{{body}}}"
    if tag == "eqArr":
        rows = [r for r in (_convert(c) for c in elm.findall(f"{M}e"))
                if r is not None]
        return "\\\\".join(rows)
    if tag == "bar":
        pos = _prop_val(elm, "barPr", "pos")
        body = _convert_children(elm, include=("e",))
        if pos == "bot":
            return f"\\underline{{{body}}}"
        return f"\\overline{{{body}}}"
    if tag == "limLow":
        body = _convert_children(elm, include=("e",))
        lim = _convert_children(elm, include=("lim",))
        prefix = {"lim": "\\lim", "max": "\\max", "min": "\\min"}.get(body)
        if prefix is None:
            return None
        return f"{prefix}_{{{lim}}}"
    if tag == "lim":
        return _convert_children(elm).replace("\\rightarrow", "\\to")
    if tag.endswith("Pr") or tag == "ctrlPr":
        return None
    return None


def omml_to_latex(omath: ET.Element) -> str:
    """One ``m:oMath`` element → LaTeX string (double spaces collapsed,
    matching the reference's final rendering pass)."""
    latex = _convert_children(omath)
    return latex.replace("  ", " ")
