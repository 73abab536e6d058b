"""Mandarin tone sandhi.

Re-implements the rule set the reference applies between segmentation and
token emission (ttts/gpt/text/tone_sandhi.py, itself the PaddleSpeech rules):

* 不: neutral inside "V不V" (看不懂); bu2 before tone 4 (不怕)
* 一: neutral between reduplicated verbs (看一看); yi1 in ordinals/digit
  strings; yi2 before tone 4 (一段); yi4 before tones 1/2/3 (一天)
* neutral tone: sentence-final particles, 的/地/得, 们/子 suffixes,
  locative 上/下/里, directional 来/去 after 上/下/..., measure word 个,
  reduplicated n/v/a words, and a closed lexicon of habitual neutral-tone
  words (e.g. 东西, 什么)
* third-tone sandhi: 3-3 -> 2-3, with word-structure-aware grouping for
  3- and 4-syllable words

Unlike the reference (which mutates pypinyin "finals" strings), this module
operates directly on whole syllable+tone tokens ("hao3"), the canonical unit
of xtts_tpu.text.pinyin — only the trailing tone digit is ever rewritten.

A pre-merge pass re-joins segments jieba splits too finely (single 不/一,
reduplications, adjacent all-third-tone words, trailing 儿) so the word-level
rules see the right units (tone_sandhi.py:758-768 has the same passes).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jieba

Seg = Tuple[str, str]  # (word, pos)

# Words that habitually carry a neutral final syllable. Closed-class subset
# of the reference's list (tone_sandhi.py:31-445) — extend freely.
NEUTRAL_TONE_WORDS = {
    "东西", "什么", "怎么", "这么", "那么", "多么", "时候", "丈夫", "先生",
    "休息", "觉得", "记得", "认得", "晓得", "明白", "清楚", "便宜", "漂亮",
    "喜欢", "知道", "事情", "关系", "意思", "咳嗽", "商量", "打听", "告诉",
    "耳朵", "眼睛", "鼻子", "嘴巴", "脑袋", "头发", "尾巴", "衣服",
    "裤子", "袜子", "帽子", "鞋子", "房子", "屋子", "院子", "村子", "馆子",
    "桌子", "椅子", "凳子", "杯子", "盘子", "筷子", "刀子", "叉子", "瓶子",
    "盒子", "箱子", "袋子", "绳子", "钉子", "锤子", "梯子", "票子", "面子",
    "样子", "法子", "点子", "日子", "年头", "月亮", "星星", "云彩", "石头",
    "木头", "砖头", "骨头", "拳头", "指头", "舌头", "念头", "苗头", "风头",
    "上头", "下头", "前头", "后头", "里头", "外头", "地方", "地道", "地下",
    "姑娘", "媳妇", "婆婆", "公公", "叔叔", "婶婶", "舅舅", "姥姥", "爷爷",
    "奶奶", "爸爸", "妈妈", "哥哥", "姐姐", "弟弟", "妹妹", "孩子", "儿子",
    "孙子", "侄子", "女婿", "亲戚", "朋友", "伙计", "徒弟", "师傅", "大夫",
    "客气", "力气", "运气", "福气", "脾气", "名气", "神气", "阔气", "和气",
    "热闹", "暖和", "凉快", "痛快", "爽快", "勤快", "利落", "干净", "规矩",
    "折腾", "吆喝", "叫唤", "招呼", "打扮", "打扫", "收拾", "拾掇", "糊涂",
    "马虎", "含糊", "啰嗦", "唠叨", "哆嗦", "嘱咐", "吩咐", "巴结", "奉承",
    "欺负", "冤枉", "委屈", "将就", "凑合", "对付", "答应", "哈欠", "喷嚏",
    "困难", "麻烦", "功夫", "工夫", "本事", "买卖", "生意", "招牌", "字号",
    "消息", "动静", "声音", "窗户", "门口", "出息", "学问", "学生",
    "先头", "来头", "甜头", "苦头", "看头", "吃头", "准头", "势头",
    "活泼", "玩意", "饺子", "包子", "馒头", "豆腐", "芝麻", "核桃", "葡萄",
    "萝卜", "白菜", "茄子", "黄瓜", "土豆", "玉米", "高粱", "庄稼", "棉花",
    "蘑菇", "木耳", "香肠", "点心", "烧饼", "油条", "粉条", "咸菜", "酱油",
    "师父", "徒弟", "和尚", "尼姑", "喇嘛", "菩萨", "神仙", "妖怪", "狐狸",
    "猴子", "兔子", "猪猡", "骡子", "驴子", "蚊子", "虱子", "跳蚤", "苍蝇",
    "蛤蟆", "蝌蚪", "燕子", "鸽子", "鸭子", "雀子", "虫子", "蝎子", "壁虎",
    "月饼", "粽子", "元宵", "灯笼", "鞭炮", "对联", "喜钱", "压岁钱",
}

# Words ending in 子/们 where 子 is a real morpheme (never neutral).
NON_NEUTRAL_SUFFIX_WORDS = {
    "量子", "分子", "原子", "电子", "光子", "质子", "中子", "离子", "粒子",
    "男子", "女子", "莲子", "瓜子", "石子", "种子", "骰子", "君子", "人人",
}

_PARTICLES = "吧呢啊呐嘛吖哟喽啰耶喔诶哦哒哩噻嘞咯"
_DE_PARTICLES = "的地得"
_PUNCT = "：，；。？！“”‘’':,;.?!…-"


def _tone(syl: str) -> str:
    return syl[-1]


def _set_tone(syl: str, tone: str) -> str:
    return syl[:-1] + tone


def _all_third(syls: Sequence[str]) -> bool:
    return len(syls) > 0 and all(_tone(s) == "3" for s in syls)


class ToneSandhi:
    """Apply merge passes + per-word tone rules.

    g2p: callable word -> [syllable+tone or None]; needed by the merge passes
    to look at tones across segment boundaries.
    """

    def __init__(self, g2p: Optional[Callable[[str], List[Optional[str]]]] = None):
        if g2p is None:
            from xtts_tpu.text.pinyin import G2P
            g2p = G2P()
        self._g2p = g2p

    # -- segment merging ---------------------------------------------------

    def pre_merge(self, seg: List[Seg]) -> List[Seg]:
        seg = self._merge_bu(seg)
        seg = self._merge_yi(seg)
        seg = self._merge_redup(seg)
        seg = self._merge_third_tone(seg)
        seg = self._merge_er(seg)
        return seg

    @staticmethod
    def _merge_bu(seg: List[Seg]) -> List[Seg]:
        """Glue a lone 不 onto the following word so _rule_bu sees context."""
        out: List[Seg] = []
        pend = False
        for word, pos in seg:
            if pend:
                word = "不" + word
                pend = False
            if word == "不":
                pend = True
            else:
                out.append((word, pos))
        if pend:
            out.append(("不", "d"))
        return out

    @staticmethod
    def _merge_yi(seg: List[Seg]) -> List[Seg]:
        """看/一/看 -> 看一看; then glue remaining lone 一 forward."""
        out: List[Seg] = []
        i = 0
        while i < len(seg):
            word, pos = seg[i]
            if (word == "一" and 0 < i < len(seg) - 1
                    and seg[i - 1][0] == seg[i + 1][0]
                    and seg[i - 1][1] == "v" and out):
                out[-1] = (out[-1][0] + "一" + seg[i + 1][0], out[-1][1])
                i += 2
            else:
                out.append((word, pos))
                i += 1
        merged: List[Seg] = []
        for word, pos in out:
            if merged and merged[-1][0] == "一":
                merged[-1] = ("一" + word, pos)
            else:
                merged.append((word, pos))
        return merged

    @staticmethod
    def _merge_redup(seg: List[Seg]) -> List[Seg]:
        out: List[Seg] = []
        for word, pos in seg:
            if out and word == out[-1][0] and len(word) == 1:
                out[-1] = (out[-1][0] + word, out[-1][1])
            else:
                out.append((word, pos))
        return out

    def _merge_third_tone(self, seg: List[Seg]) -> List[Seg]:
        """Join adjacent segments across a 3-3 boundary (<=3 chars total) so
        third-tone sandhi applies across what jieba split."""
        for boundary_only in (False, True):
            out: List[Seg] = []
            merged_prev = False
            for i, (word, pos) in enumerate(seg):
                ok = False
                if out and not merged_prev:
                    prev = out[-1][0]
                    ps = [s for s in self._g2p(prev) if s]
                    cs = [s for s in self._g2p(word) if s]
                    if ps and cs and len(prev) + len(word) <= 3 \
                            and not (len(prev) == 2 and prev[0] == prev[1]):
                        if boundary_only:
                            ok = _tone(ps[-1]) == "3" and _tone(cs[0]) == "3"
                        else:
                            ok = _all_third(ps) and _all_third(cs)
                if ok:
                    out[-1] = (out[-1][0] + word, out[-1][1])
                    merged_prev = True
                else:
                    out.append((word, pos))
                    merged_prev = False
            seg = out
        return seg

    @staticmethod
    def _merge_er(seg: List[Seg]) -> List[Seg]:
        out: List[Seg] = []
        for word, pos in seg:
            if word == "儿" and out:
                out[-1] = (out[-1][0] + word, out[-1][1])
            else:
                out.append((word, pos))
        return out

    # -- per-word tone rules ----------------------------------------------

    def apply(self, word: str, pos: str, syls: List[str]) -> List[str]:
        """Rewrite tones of `syls` (one per char of `word`)."""
        if len(syls) != len(word):
            return syls  # caller dropped unknown chars; skip rules
        syls = self._rule_bu(word, syls)
        syls = self._rule_yi(word, syls)
        syls = self._rule_neutral(word, pos, syls)
        syls = self._rule_third(word, syls)
        return syls

    @staticmethod
    def _rule_bu(word: str, syls: List[str]) -> List[str]:
        if len(word) == 3 and word[1] == "不":
            syls[1] = _set_tone(syls[1], "5")
            return syls
        for i, ch in enumerate(word):
            if ch == "不" and i + 1 < len(word) and _tone(syls[i + 1]) == "4":
                syls[i] = _set_tone(syls[i], "2")
        return syls

    @staticmethod
    def _rule_yi(word: str, syls: List[str]) -> List[str]:
        if "一" not in word:
            return syls
        if all(c.isnumeric() for c in word if c != "一"):
            return syls  # digit string: keep yi1
        if len(word) == 3 and word[1] == "一" and word[0] == word[2]:
            syls[1] = _set_tone(syls[1], "5")
            return syls
        if word.startswith("第一"):
            return syls
        for i, ch in enumerate(word):
            if ch == "一" and i + 1 < len(word) and word[i + 1] not in _PUNCT:
                nxt = _tone(syls[i + 1])
                syls[i] = _set_tone(syls[i], "2" if nxt == "4" else "4")
        return syls

    def _rule_neutral(self, word: str, pos: str, syls: List[str]) -> List[str]:
        # reduplication: 奶奶 / 试试 / 慢慢
        for j in range(1, len(word)):
            if word[j] == word[j - 1] and pos[:1] in {"n", "v", "a"} \
                    and word not in NON_NEUTRAL_SUFFIX_WORDS:
                syls[j] = _set_tone(syls[j], "5")
        if word[-1] in _PARTICLES or word[-1] in _DE_PARTICLES:
            syls[-1] = _set_tone(syls[-1], "5")
        elif len(word) > 1 and word[-1] in "们子" and pos in {"r", "n"} \
                and word not in NON_NEUTRAL_SUFFIX_WORDS:
            syls[-1] = _set_tone(syls[-1], "5")
        elif len(word) > 1 and word[-1] in "上下里" and pos in {"s", "l", "f"}:
            syls[-1] = _set_tone(syls[-1], "5")
        elif len(word) > 1 and word[-1] in "来去" and word[-2] in "上下进出回过起开":
            syls[-1] = _set_tone(syls[-1], "5")
        else:
            gi = word.find("个")
            if (gi >= 1 and (word[gi - 1].isnumeric()
                             or word[gi - 1] in "几有两半多各整每做是")) or word == "个":
                syls[gi] = _set_tone(syls[gi], "5")
            elif word in NEUTRAL_TONE_WORDS or word[-2:] in NEUTRAL_TONE_WORDS:
                syls[-1] = _set_tone(syls[-1], "5")
        # neutralize known-neutral subwords of compounds
        first, second = self._split_word(word)
        if second:
            a, b = syls[:len(first)], syls[len(first):]
            for part, ss in ((first, a), (second, b)):
                if part in NEUTRAL_TONE_WORDS or part[-2:] in NEUTRAL_TONE_WORDS:
                    ss[-1] = _set_tone(ss[-1], "5")
            syls = a + b
        return syls

    @staticmethod
    def _split_word(word: str) -> Tuple[str, str]:
        """Best-effort two-way morphological split via jieba's search cut."""
        if len(word) < 2:
            return word, ""
        subs = sorted(jieba.cut_for_search(word), key=len)
        if not subs or len(subs) == 1:
            return word, ""
        first = subs[0]
        if word.startswith(first):
            return first, word[len(first):]
        return word[:-len(first)], word[-len(first):]

    def _rule_third(self, word: str, syls: List[str]) -> List[str]:
        n = len(syls)
        if n == 2 and _all_third(syls):
            syls[0] = _set_tone(syls[0], "2")
        elif n == 3:
            first, second = self._split_word(word)
            split = len(first) if second else 1
            if _all_third(syls):
                if split == 2:
                    syls[0] = _set_tone(syls[0], "2")
                    syls[1] = _set_tone(syls[1], "2")
                else:
                    syls[1] = _set_tone(syls[1], "2")
            else:
                a, b = syls[:split], syls[split:]
                if _all_third(a) and len(a) == 2:
                    a[0] = _set_tone(a[0], "2")
                elif b and _tone(b[0]) == "3" and a and _tone(a[-1]) == "3":
                    a[-1] = _set_tone(a[-1], "2")
                syls = a + b
        elif n == 4:
            for k in (0, 2):
                if _all_third(syls[k:k + 2]):
                    syls[k] = _set_tone(syls[k], "2")
        return syls
