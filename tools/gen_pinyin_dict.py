"""Generate the extended Mandarin pinyin phoneme dictionary
(``dictionaries/opencpop-extension.txt``).

The table is derived from pinyin phonology plus the opencpop-extension
conventions for singing voice synthesis (reference
dictionaries/opencpop-extension.txt; the phoneme inventory must match
exactly for checkpoint compatibility — this is the token vocabulary models
are trained against):

* finals keep their surface pinyin spelling (ui, un, iu — not uei/uen/iou);
* apical vowels: i -> i0 after z/c/s, i -> ir after zh/ch/sh/r;
* the palatal i is additionally reachable after retroflexes/sibilants via the
  explicit 'yi' spelling (zhyi -> zh i), and true u after y via 'ywu';
* the ü series: u/ue/uan/un -> v/ve/van/vn after j/q/x/y; the explicit 'v'/
  've' spellings extend ü to the other initials (nv, bve, ...);
* y + e/an use the open-mid vowels E/En (ye -> y E, yan -> y En);
* y/w are emitted as consonant phonemes.

Run: python tools/gen_pinyin_dict.py [out_path]
"""

import sys

LABIALS = ["b", "p", "m", "f"]
DENTALS = ["d", "t", "n", "l"]
VELARS = ["g", "k", "h"]
PALATALS = ["j", "q", "x"]
RETROFLEX = ["zh", "ch", "sh", "r"]
SIBILANTS = ["z", "c", "s"]
PLAIN19 = LABIALS + DENTALS + VELARS + RETROFLEX + SIBILANTS  # no j/q/x/y/w

# initial sets per final class ("" = bare final)
ALL21 = [""] + PLAIN19 + ["y", "w"]
EN20 = [""] + PLAIN19 + ["w"]
I23 = PLAIN19 + PALATALS + ["y", "w"]
IA14 = LABIALS + DENTALS + VELARS + PALATALS
IN15 = IA14 + ["y"]
IU13 = [i for i in IA14 if i != "t"]
O8 = ["", "b", "p", "m", "f", "l", "y", "w"]
UA18 = PLAIN19 + []  # v/ua/uai/uang/ui reach every plain initial
UO14 = DENTALS + VELARS + RETROFLEX + SIBILANTS
UANUN22 = PLAIN19 + PALATALS + ["y"]
UE4 = PALATALS + ["y"]
VE11 = LABIALS + DENTALS + VELARS


def mapped_final(ini: str, fin: str) -> str:
    """Phoneme for `fin` when preceded by initial `ini`."""
    if fin == "i":
        if ini in SIBILANTS:
            return "i0"
        if ini in RETROFLEX:
            return "ir"
        return "i"
    if fin == "u" and ini in PALATALS + ["y"]:
        return "v"
    if fin == "ue":
        return "ve"
    if fin == "uan" and ini in PALATALS + ["y"]:
        return "van"
    if fin == "un" and ini in PALATALS + ["y"]:
        return "vn"
    if fin == "e" and ini == "y":
        return "E"
    if fin == "an" and ini == "y":
        return "En"
    if fin == "yi":  # explicit palatal-i spelling after retroflex/sibilant
        return "i"
    if fin == "wu":  # explicit true-u spelling after y
        return "u"
    return fin


def build_table():
    grid = [
        (["a", "ai", "an", "ang", "ao", "e", "ei", "ong", "ou"], ALL21),
        (["en", "eng", "er"], EN20),
        (["i"], I23),
        (["ia", "ian", "iang", "iao", "ie", "iong"], IA14),
        (["in", "ing"], IN15),
        (["iu"], IU13),
        (["o"], O8),
        (["u"], I23),
        (["ua", "uai", "uang", "ui", "v"], UA18),
        (["uan", "un"], UANUN22),
        (["ue"], UE4),
        (["uo"], UO14),
        (["ve"], VE11),
        (["yi"], RETROFLEX[:-1] + ["r"] + SIBILANTS),  # zh ch sh r z c s
        (["wu"], ["y"]),
    ]
    table = {}
    for finals, inis in grid:
        for fin in finals:
            for ini in inis:
                syllable = ini + fin
                phones = ([ini] if ini else []) + [mapped_final(ini, fin)]
                table[syllable] = " ".join(phones)
    return dict(sorted(table.items()))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "dictionaries/opencpop-extension.txt"
    table = build_table()
    with open(out, "w") as f:
        for syl, phs in table.items():
            f.write(f"{syl}\t{phs}\n")
    print(f"wrote {len(table)} syllables to {out}")


if __name__ == "__main__":
    main()
