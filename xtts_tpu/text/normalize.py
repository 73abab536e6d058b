"""Chinese text normalization (NSW -> spoken Mandarin).

Covers the rule families the reference pulls from its vendored PaddleSpeech
normalizer (ttts/gpt/text/zh_normalization/: num.py, chronology.py,
phonecode.py, quantifier.py, text_normlization.py): dates, clock times,
ranges, fractions, percentages, temperatures, mobile/landline numbers,
decimals, signed numbers, and plain integers, plus full-width ASCII folding.

The implementation here is written fresh around a single verbalization core
(`num_to_zh`) and an ordered regex cascade; rule order matters (dates and
phone numbers must fire before the generic integer rule).
"""
from __future__ import annotations

import re
from typing import List

DIGITS = "零一二三四五六七八九"
UNITS = ["", "十", "百", "千"]
GROUP_UNITS = ["", "万", "亿", "万亿"]


def _four_digits_to_zh(n: int, drop_leading_one: bool = False) -> str:
    """0-9999 -> spoken form. drop_leading_one: 10-19 read 十x not 一十x."""
    if n == 0:
        return DIGITS[0]
    out: List[str] = []
    digits = [int(d) for d in str(n)]
    L = len(digits)
    for i, d in enumerate(digits):
        unit = UNITS[L - 1 - i]
        if d == 0:
            if out and out[-1] != DIGITS[0] and i != L - 1:
                out.append(DIGITS[0])
        else:
            if d == 1 and unit == "十" and i == 0 and L == 2 and drop_leading_one:
                out.append(unit)
            else:
                out.append(DIGITS[d] + unit)
    s = "".join(out)
    return s.rstrip(DIGITS[0]) if len(s) > 1 else s


def num_to_zh(value: str, drop_leading_one: bool = True) -> str:
    """Integer string -> spoken Mandarin with 万/亿 grouping."""
    value = value.lstrip("0") or "0"
    n = int(value)
    if n == 0:
        return DIGITS[0]
    groups: List[int] = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    parts: List[str] = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            continue
        head_drop = drop_leading_one and gi == len(groups) - 1
        text = _four_digits_to_zh(g, drop_leading_one=head_drop)
        # zero-fill between non-adjacent groups: 100000001 -> 一亿零一
        if parts and groups[gi + 1] != 0 and g < 1000:
            parts.append(DIGITS[0])
        elif parts and groups[gi + 1] == 0:
            parts.append(DIGITS[0])
        parts.append(text + GROUP_UNITS[gi])
    return "".join(parts)


def digits_to_zh(value: str, zero: str = "零") -> str:
    """Digit-by-digit reading (phone numbers, verbatim codes). 1 reads 幺."""
    table = {"0": zero, "1": "幺", "2": "二", "3": "三", "4": "四",
             "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}
    return "".join(table.get(c, c) for c in value)


def digits_to_zh_plain(value: str) -> str:
    """Digit-by-digit with 一 for 1 (years, verse numbers)."""
    return "".join(DIGITS[int(c)] if c.isdigit() else c for c in value)


def decimal_to_zh(value: str) -> str:
    sign = ""
    if value[0] in "+-":
        sign = "正" if value[0] == "+" else "负"
        value = value[1:]
    if "." in value:
        ip, fp = value.split(".", 1)
        ip_zh = num_to_zh(ip) if ip else DIGITS[0]
        fp_zh = digits_to_zh_plain(fp)
        return f"{sign}{ip_zh}点{fp_zh}"
    return sign + num_to_zh(value)


# ---------------------------------------------------------------------------
# Regex cascade
# ---------------------------------------------------------------------------

_RE_FULLWIDTH = {chr(0xFF01 + i): chr(0x21 + i) for i in range(94)}
_RE_FULLWIDTH["　"] = " "

_RE_DATE = re.compile(
    r"(\d{2,4})\s*[年/.-]\s*(\d{1,2})\s*[月/.-]\s*(\d{1,2})\s*([日号])?")
_RE_YEAR_MONTH = re.compile(r"(\d{2,4})\s*年\s*(\d{1,2})\s*月")
_RE_YEAR = re.compile(r"(\d{2,4})\s*年")
_RE_TIME = re.compile(r"(\d{1,2}):(\d{1,2})(?::(\d{1,2}))?")
_RE_MOBILE = re.compile(r"(?<!\d)(1[3-9]\d{9})(?!\d)")
_RE_LANDLINE = re.compile(r"(?<!\d)(0\d{2,3})-(\d{7,8})(?!\d)")
_RE_TEMP = re.compile(r"(-?\d+(?:\.\d+)?)\s*(?:°C|℃|摄氏度)")
_RE_PERCENT = re.compile(r"(-?\d+(?:\.\d+)?)\s*%")
_RE_FRACTION = re.compile(r"(?<![\d.])(\d+)/(\d+)(?![\d.])")
_RE_RANGE = re.compile(r"(\d+(?:\.\d+)?)\s*[-~—～]\s*(\d+(?:\.\d+)?)"
                       r"(?=[个件名位只条人次度元块岁年月日天%])")
_RE_MONEY = re.compile(r"[¥￥]\s*(\d+(?:\.\d+)?)")
_RE_DECIMAL = re.compile(r"(?<![\d.])(-?\d+\.\d+)(?!\d)")
_RE_INTEGER = re.compile(r"(?<![\d.])(-?\d+)(?![\d.])")


def _sub_date(m: re.Match) -> str:
    y, mo, d = m.group(1), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        return m.group(0)
    suffix = m.group(4) or "日"
    return f"{digits_to_zh_plain(y)}年{num_to_zh(str(mo))}月{num_to_zh(str(d))}{suffix}"


def _sub_year_month(m: re.Match) -> str:
    mo = int(m.group(2))
    if not 1 <= mo <= 12:
        return m.group(0)
    return f"{digits_to_zh_plain(m.group(1))}年{num_to_zh(str(mo))}月"


def _sub_time(m: re.Match) -> str:
    h, mi = int(m.group(1)), int(m.group(2))
    if h > 23 or mi > 59:
        return m.group(0)
    out = f"{num_to_zh(str(h))}点"
    if mi:
        out += ("零" if mi < 10 else "") + f"{num_to_zh(str(mi))}分"
    if m.group(3) is not None:
        s = int(m.group(3))
        out += f"{num_to_zh(str(s))}秒"
    return out


def _sub_fraction(m: re.Match) -> str:
    num, den = m.group(1), m.group(2)
    return f"{num_to_zh(den)}分之{num_to_zh(num)}"


class TextNormalizer:
    """Sentence-level normalizer: NSW expansion + width folding.

    Mirrors the entry points of the reference's TextNormalizer
    (zh_normalization/text_normlization.py:36-156).
    """

    SENTENCE_SPLIT_RE = re.compile(r"(?<=[。！？!?；;\n])")

    def normalize_sentence(self, text: str) -> str:
        text = "".join(_RE_FULLWIDTH.get(c, c) for c in text)
        text = _RE_DATE.sub(_sub_date, text)
        text = _RE_YEAR_MONTH.sub(_sub_year_month, text)
        text = _RE_YEAR.sub(lambda m: digits_to_zh_plain(m.group(1)) + "年", text)
        text = _RE_TIME.sub(_sub_time, text)
        text = _RE_MOBILE.sub(lambda m: digits_to_zh(m.group(1)), text)
        text = _RE_LANDLINE.sub(
            lambda m: digits_to_zh(m.group(1)) + digits_to_zh(m.group(2)), text)
        text = _RE_TEMP.sub(
            lambda m: decimal_to_zh(m.group(1)) + "摄氏度", text)
        text = _RE_PERCENT.sub(
            lambda m: "百分之" + decimal_to_zh(m.group(1)), text)
        text = _RE_FRACTION.sub(_sub_fraction, text)
        text = _RE_RANGE.sub(
            lambda m: f"{decimal_to_zh(m.group(1))}到{decimal_to_zh(m.group(2))}",
            text)
        text = _RE_MONEY.sub(lambda m: decimal_to_zh(m.group(1)) + "元", text)
        text = _RE_DECIMAL.sub(lambda m: decimal_to_zh(m.group(1)), text)
        text = _RE_INTEGER.sub(lambda m: decimal_to_zh(m.group(1)), text)
        return text

    def normalize(self, text: str) -> List[str]:
        sentences = [s for s in self.SENTENCE_SPLIT_RE.split(text) if s.strip()]
        return [self.normalize_sentence(s) for s in sentences]
