"""r6: the trie-compiled mention regex must match exactly like the
longest-first flat alternation it replaced."""

import re

from csvw_rdf_convertor_spark.kg.mentions import _build_lookup, _trie_pattern
from csvw_rdf_convertor_spark.kg.synth import alias_dictionary


def _flat_rx(lookup):
    pat = "|".join(re.escape(a) for a in sorted(lookup, key=len, reverse=True))
    return re.compile(f"(?i)\\b({pat})\\b")


def test_trie_matches_flat_on_dictionary():
    lookup, rx_trie = _build_lookup(alias_dictionary())
    rx_flat = _flat_rx(lookup)
    texts = [
        "turn 3 discusses Mercury 12 and the mercury in conversation.",
        "MERCURY vs Mercury vs mercury 1",
        "spark and the spark 4; Paris, PARIS 8!",
        "iron iron 5 irons ironing",          # \b: 'irons' must not match
        "nothing here",
        "copper12 copper 12 copper",          # \b before digits
        "the venus the saturn 19 Titanium",
    ]
    for t in texts:
        assert [m.group(1) for m in rx_trie.finditer(t)] == \
               [m.group(1) for m in rx_flat.finditer(t)], t


def test_trie_prefers_longest_like_flat():
    words = ["ab", "abcd", "abce", "b", "ba"]
    rx_t = re.compile(f"\\b({_trie_pattern(words)})\\b")
    flat = "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True))
    rx_f = re.compile(f"\\b({flat})\\b")
    for t in ["abcd x", "abce.", "ab c", "abcx", "ba ab", "b a", "abcdx"]:
        assert [m.group(1) for m in rx_t.finditer(t)] == \
               [m.group(1) for m in rx_f.finditer(t)], t
