"""Simple-font encodings (PDF spec §9.6.5, Annex D) and the Adobe
Glyph List subset they draw names from.

The reference reads PDFs through a library that resolves font
encodings internally (reference src/extraction/text_extractor.pyc —
text arrives already decoded); re-built from scratch the mapping has
to be explicit.  Three layers, all public knowledge (PDF 32000-1
Annex D; Adobe Glyph List):

- ``AGL``: glyph name -> unicode string, covering every name used by
  the three standard Latin base encodings plus the typographic set
  /Differences arrays commonly reference (quotes, dashes, ligatures,
  currency, accents, full Latin-1 letters).  ``glyph_to_unicode``
  adds the algorithmic ``uniXXXX`` / ``uXXXX[XX]`` forms.
- base-encoding tables code -> unicode: WinAnsiEncoding and
  MacRomanEncoding derive from the cp1252 / mac-roman codecs they
  were standardized from; StandardEncoding (Annex D.2) is spelled
  literally (ASCII except 0x27 quoteright / 0x60 quoteleft, plus its
  own high region).
- ``encoding_map(base, differences)``: the §9.6.5 composition — start
  from the base table, then walk the /Differences array (an int sets
  the next code, names assign consecutive codes).  Unknown glyph
  names map to nothing (the code passes through unmapped downstream,
  same contract as a font with no map at all).

Fonts with a /ToUnicode CMap never reach these tables — §9.10.2 says
ToUnicode wins, and `PdfFile.page_font_maps` implements that order.
"""
from __future__ import annotations

# -- Adobe Glyph List subset: every name in the Annex D Latin tables
# plus the common typographic extras.  ASCII letters name themselves.
AGL: dict[str, str] = {
    # ASCII punctuation and digits
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_",
    "grave": "`", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~",
    # Latin-1 supplement
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±",
    "twosuperior": "²", "threesuperior": "³",
    "acute": "´", "mu": "µ", "paragraph": "¶",
    "periodcentered": "·", "cedilla": "¸",
    "onesuperior": "¹", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×",
    "divide": "÷",
    # typographic set
    "quoteleft": "‘", "quoteright": "’",
    "quotesinglbase": "‚", "quotedblleft": "“",
    "quotedblright": "”", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•",
    "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "Euro": "€", "trademark": "™",
    "minus": "−", "endash": "–", "emdash": "—",
    "florin": "ƒ", "fi": "ﬁ", "fl": "ﬂ",
    "dotlessi": "ı", "OE": "Œ", "oe": "œ",
    "Scaron": "Š", "scaron": "š", "Ydieresis": "Ÿ",
    "Zcaron": "Ž", "zcaron": "ž", "Lslash": "Ł",
    "lslash": "ł", "germandbls": "ß",
    # spacing accents (Annex D high regions)
    "circumflex": "ˆ", "tilde": "˜", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "hungarumlaut": "˝",
}
# Latin-1 letters (Agrave..ydieresis): generate from the codec once —
# glyph names per AGL match unicodedata-free explicit spelling
_LATIN1_NAMES = {
    0xC0: "Agrave", 0xC1: "Aacute", 0xC2: "Acircumflex",
    0xC3: "Atilde", 0xC4: "Adieresis", 0xC5: "Aring", 0xC6: "AE",
    0xC7: "Ccedilla", 0xC8: "Egrave", 0xC9: "Eacute",
    0xCA: "Ecircumflex", 0xCB: "Edieresis", 0xCC: "Igrave",
    0xCD: "Iacute", 0xCE: "Icircumflex", 0xCF: "Idieresis",
    0xD0: "Eth", 0xD1: "Ntilde", 0xD2: "Ograve", 0xD3: "Oacute",
    0xD4: "Ocircumflex", 0xD5: "Otilde", 0xD6: "Odieresis",
    0xD8: "Oslash", 0xD9: "Ugrave", 0xDA: "Uacute",
    0xDB: "Ucircumflex", 0xDC: "Udieresis", 0xDD: "Yacute",
    0xDE: "Thorn", 0xE0: "agrave", 0xE1: "aacute",
    0xE2: "acircumflex", 0xE3: "atilde", 0xE4: "adieresis",
    0xE5: "aring", 0xE6: "ae", 0xE7: "ccedilla", 0xE8: "egrave",
    0xE9: "eacute", 0xEA: "ecircumflex", 0xEB: "edieresis",
    0xEC: "igrave", 0xED: "iacute", 0xEE: "icircumflex",
    0xEF: "idieresis", 0xF0: "eth", 0xF1: "ntilde", 0xF2: "ograve",
    0xF3: "oacute", 0xF4: "ocircumflex", 0xF5: "otilde",
    0xF6: "odieresis", 0xF8: "oslash", 0xF9: "ugrave",
    0xFA: "uacute", 0xFB: "ucircumflex", 0xFC: "udieresis",
    0xFD: "yacute", 0xFE: "thorn", 0xFF: "ydieresis",
}
AGL.update({name: chr(cp) for cp, name in _LATIN1_NAMES.items()})
AGL.update({c: c for c in
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"})


def glyph_to_unicode(name: str) -> str | None:
    """AGL lookup plus the algorithmic uniXXXX / uXXXX[XX] forms;
    None for names outside the table (gNN, cidNN, ornaments)."""
    hit = AGL.get(name)
    if hit is not None:
        return hit
    try:
        if name.startswith("uni") and len(name) == 7:
            return chr(int(name[3:], 16))
        if name.startswith("u") and 5 <= len(name) <= 7:
            return chr(int(name[1:], 16))
    except ValueError:
        return None
    return None


def _codec_table(codec: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for b in range(32, 256):
        try:
            out[b] = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            pass
    return out


# Annex D.2 StandardEncoding: ASCII with typographic quotes at
# 0x27/0x60, its own high region, codes outside the table unmapped
STANDARD_ENCODING: dict[int, str] = {
    b: chr(b) for b in range(0x20, 0x7F) if b not in (0x27, 0x60)}
STANDARD_ENCODING.update({
    0x27: "’", 0x60: "‘",
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
    0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
    0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
    0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ",
    0xB1: "–", 0xB2: "†", 0xB3: "‡", 0xB4: "·",
    0xB6: "¶", 0xB7: "•", 0xB8: "‚", 0xB9: "„",
    0xBA: "”", 0xBB: "»", 0xBC: "…", 0xBD: "‰",
    0xBF: "¿",
    0xC1: "`", 0xC2: "´", 0xC3: "ˆ", 0xC4: "˜",
    0xC5: "¯", 0xC6: "˘", 0xC7: "˙", 0xC8: "¨",
    0xCA: "˚", 0xCB: "¸", 0xCD: "˝", 0xCE: "˛",
    0xCF: "ˇ", 0xD0: "—",
    0xE1: "Æ", 0xE3: "ª", 0xE8: "Ł", 0xE9: "Ø",
    0xEA: "Œ", 0xEB: "º", 0xF1: "æ", 0xF5: "ı",
    0xF8: "ł", 0xF9: "ø", 0xFA: "œ", 0xFB: "ß",
})

_BASE_TABLES: dict[str, dict[int, str]] = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": _codec_table("cp1252"),
    "MacRomanEncoding": _codec_table("mac_roman"),
}


def encoding_map(base: str | None,
                 differences: list | None = None) -> dict[int, str]:
    """§9.6.5 simple-font code -> unicode map: the named base table
    (StandardEncoding when ``base`` is None or unknown — the spec's
    nonsymbolic default) overlaid with a /Differences array (ints set
    the next code, names assign consecutive codes; names outside the
    glyph list leave their code unmapped)."""
    out = dict(_BASE_TABLES.get(base or "StandardEncoding",
                                STANDARD_ENCODING))
    code = 0
    for item in differences or []:
        if isinstance(item, (int, float)):
            code = int(item)
            continue
        u = glyph_to_unicode(str(item))
        if u is not None:
            out[code] = u
        else:
            out.pop(code, None)
        code += 1
    return out
