"""Porter stemmer, faithful to the classic JavaScript implementation that
lunr 1.0.0 ships as ``lunr.stemmer`` (the public-domain tartarus js port of
Martin Porter's algorithm, including its documented vocabulary departures:
step2 ``bli -> ble`` and ``logi -> log``).

Pure function; used inside Arrow-batched pandas UDFs at index-build time and
driver-side at query time, so it must be allocation-light.

Parity anchor: /root/reference/tests/fulltext.spec.ts:81-120 pins stemmer
behavior through prefix-stepping assertions ('elation', 'source',
'headless').
"""

from __future__ import annotations

import re

_step2list = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent", "eli": "e",
    "ousli": "ous", "ization": "ize", "ation": "ate", "ator": "ate",
    "alism": "al", "iveness": "ive", "fulness": "ful", "ousness": "ous",
    "aliti": "al", "iviti": "ive", "biliti": "ble", "logi": "log",
}
_step3list = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic", "ical": "ic",
    "ful": "", "ness": "",
}

_c = "[^aeiou]"
_v = "[aeiouy]"
_C = _c + "[^aeiouy]*"
_V = _v + "[aeiou]*"

_mgr0 = re.compile("^(" + _C + ")?" + _V + _C)
_meq1 = re.compile("^(" + _C + ")?" + _V + _C + "(" + _V + ")?$")
_mgr1 = re.compile("^(" + _C + ")?" + _V + _C + _V + _C)
_s_v = re.compile("^(" + _C + ")?" + _v)

_re_1a1 = re.compile(r"^(.+?)(ss|i)es$")
_re_1a2 = re.compile(r"^(.+?)([^s])s$")
_re_1b1 = re.compile(r"^(.+?)eed$")
_re_1b2 = re.compile(r"^(.+?)(ed|ing)$")
_re_atblitz = re.compile(r"(at|bl|iz)$")
_re_double = re.compile(r"([^aeiouylsz])\1$")
_re_cvc = re.compile("^" + _C + _v + "[^aeiouwxy]$")
_re_1c = re.compile(r"^(.+?)y$")
_re_2 = re.compile(
    r"^(.+?)(ational|tional|enci|anci|izer|bli|alli|entli|eli|ousli|ization"
    r"|ation|ator|alism|iveness|fulness|ousness|aliti|iviti|biliti|logi)$"
)
_re_3 = re.compile(r"^(.+?)(icate|ative|alize|iciti|ical|ful|ness)$")
_re_4a = re.compile(
    r"^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate"
    r"|iti|ous|ive|ize)$"
)
_re_4b = re.compile(r"^(.+?)(s|t)(ion)$")
_re_5 = re.compile(r"^(.+?)e$")
_re_ll = re.compile(r"ll$")


def stem(w: str) -> str:
    if len(w) < 3:
        return w
    cached = _STEM_CACHE.get(w)
    if cached is not None:
        return cached
    out = _stem_uncached(w)
    if len(_STEM_CACHE) < _STEM_CACHE_MAX:
        _STEM_CACHE[w] = out
    return out


# token vocabularies repeat heavily across documents; memoizing turns the
# regex cascade into a dict hit for all but first occurrences (bounded so a
# pathological unbounded vocab can't exhaust executor memory)
_STEM_CACHE: dict = {}
_STEM_CACHE_MAX = 1 << 20


def _stem_uncached(w: str) -> str:

    firstch = w[0]
    if firstch == "y":
        w = "Y" + w[1:]

    # Step 1a
    m = _re_1a1.match(w)
    if m:
        w = m.group(1) + m.group(2)
    else:
        m = _re_1a2.match(w)
        if m:
            w = m.group(1) + m.group(2)

    # Step 1b
    m = _re_1b1.match(w)
    if m:
        if _mgr0.match(m.group(1)):
            w = w[:-1]
    else:
        m = _re_1b2.match(w)
        if m:
            s = m.group(1)
            if _s_v.match(s):
                w = s
                if _re_atblitz.search(w):
                    w = w + "e"
                elif _re_double.search(w):
                    w = w[:-1]
                elif _re_cvc.match(w):
                    w = w + "e"

    # Step 1c
    m = _re_1c.match(w)
    if m:
        s = m.group(1)
        if _s_v.match(s):
            w = s + "i"

    # Step 2
    m = _re_2.match(w)
    if m:
        s, suffix = m.group(1), m.group(2)
        if _mgr0.match(s):
            w = s + _step2list[suffix]

    # Step 3
    m = _re_3.match(w)
    if m:
        s, suffix = m.group(1), m.group(2)
        if _mgr0.match(s):
            w = s + _step3list[suffix]

    # Step 4
    m = _re_4a.match(w)
    if m:
        if _mgr1.match(m.group(1)):
            w = m.group(1)
    else:
        m = _re_4b.match(w)
        if m:
            s = m.group(1) + m.group(2)
            if _mgr1.match(s):
                w = s

    # Step 5
    m = _re_5.match(w)
    if m:
        s = m.group(1)
        if _mgr1.match(s) or (_meq1.match(s) and not _re_cvc.match(s)):
            w = s
    if _re_ll.search(w) and _mgr1.match(w):
        w = w[:-1]

    if firstch == "y":
        w = "y" + w[1:]
    return w
