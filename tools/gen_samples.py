"""Author the shipped sample scores (samples/02..07) — original short
melodies with pinyin lyrics, in the reference .ds score format
(samples/*.ds: text/ph_seq/ph_num/note_seq/note_dur/note_slur/offset;
score-only segments are completed by the variance model then rendered by the
acoustic model — BASELINE config #2's chain).

The reference ships real songs (with credits); these are original
compositions so the repo stays self-contained and unencumbered.

Run: python tools/gen_samples.py
"""

import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]
DICT = ROOT / "dictionaries" / "opencpop-extension.txt"


def load_dict():
    table = {}
    for line in open(DICT):
        syl, phs = line.rstrip("\n").split("\t")
        table[syl] = phs.split()
    return table


TABLE = load_dict()


def segment(words, notes, offset=0.0):
    """words: list of (syllable | 'AP'/'SP', [(note, dur), ...]) — extra
    note tuples on a word are slurs."""
    text, ph_seq, ph_num = [], [], []
    note_seq, note_dur, note_slur = [], [], []
    for word, wnotes in zip(words, notes):
        text.append(word)
        if word in ("AP", "SP"):
            phs = [word]
        else:
            phs = TABLE[word]
        ph_seq += phs
        ph_num.append(len(phs))
        for i, (note, dur) in enumerate(wnotes):
            note_seq.append(note)
            note_dur.append(dur)
            note_slur.append(1 if i > 0 else 0)
    return {
        "offset": offset,
        "text": " ".join(text),
        "ph_seq": " ".join(ph_seq),
        "ph_num": " ".join(str(n) for n in ph_num),
        "note_seq": " ".join(note_seq),
        "note_dur": " ".join(f"{d:g}" for d in note_dur),
        "note_slur": " ".join(str(s) for s in note_slur),
    }


def w(word, *notes):
    """word with its notes: w('ni', ('C4', .5)) or slurred w('ya', ('G4', .5), ('E4', .5))"""
    return word, list(notes)


R = "rest"


def main():
    samples = {}

    # 02: rising-falling phrase, two segments
    s1 = [w("AP", (R, 0.4)), w("chun", ("D4", 0.5)), w("feng", ("E4", 0.5)),
          w("chui", ("G4", 0.5)), w("guo", ("A4", 0.75)), w("shan", ("G4", 0.5)),
          w("gang", ("E4", 0.75), ("D4", 0.5)), w("SP", (R, 0.2))]
    s2 = [w("AP", (R, 0.3)), w("liu", ("E4", 0.5)), w("shui", ("G4", 0.5)),
          w("rao", ("A4", 0.5)), w("cun", ("B4", 0.75)), w("zhuang", ("A4", 1.0)),
          w("SP", (R, 0.3))]
    samples["02_chun_feng.ds"] = [segment(*zip(*[(a, b) for a, b in s1])),
                                  segment(*zip(*[(a, b) for a, b in s2]), offset=6.0)]

    # 03: low register (tests male-range pitch), long tones
    s = [w("AP", (R, 0.5)), w("ye", ("G3", 0.8)), w("se", ("A3", 0.6)),
         w("man", ("C4", 0.8)), w("man", ("A3", 0.6)), w("chen", ("G3", 1.0)),
         w("SP", (R, 0.2)), w("deng", ("E3", 0.6)), w("huo", ("G3", 0.6)),
         w("liang", ("A3", 1.2), ("G3", 0.6)), w("SP", (R, 0.4))]
    samples["03_ye_se.ds"] = [segment(*zip(*[(a, b) for a, b in s]))]

    # 04: fast syllabic run (tests short phoneme durations)
    s = [w("AP", (R, 0.3))] + [
        w(syl, (note, 0.25)) for syl, note in [
            ("xiao", "C4"), ("niao", "D4"), ("fei", "E4"), ("guo", "F4"),
            ("tian", "G4"), ("kong", "A4"), ("zhi", "G4"), ("shang", "F4"),
            ("hua", "E4"), ("er", "D4"), ("kai", "E4"), ("man", "D4"),
        ]
    ] + [w("shan", ("C4", 1.0)), w("SP", (R, 0.3))]
    samples["04_xiao_niao.ds"] = [segment(*zip(*[(a, b) for a, b in s]))]

    # 05: high register with wide slurs (tests female range + pitch bends)
    s = [w("AP", (R, 0.4)), w("yue", ("A4", 0.6)), w("liang", ("B4", 0.6)),
         w("gua", ("D5", 0.8), ("B4", 0.4)), w("tian", ("A4", 0.6)),
         w("bian", ("G4", 0.8), ("A4", 0.6), ("B4", 0.8)), w("SP", (R, 0.5))]
    samples["05_yue_liang.ds"] = [segment(*zip(*[(a, b) for a, b in s]))]

    # 06: extension syllables (ü series and apical vowels)
    s = [w("AP", (R, 0.4)), w("lv", ("E4", 0.6)), w("ye", ("G4", 0.6)),
         w("qu", ("A4", 0.6)), w("zhi", ("G4", 0.6)), w("si", ("E4", 0.6)),
         w("xu", ("D4", 0.8)), w("SP", (R, 0.2)), w("yuan", ("E4", 0.6)),
         w("fang", ("G4", 0.6)), w("de", ("A4", 0.4)), w("ge", ("G4", 1.2), ("E4", 0.6)),
         w("SP", (R, 0.4))]
    samples["06_lv_ye.ds"] = [segment(*zip(*[(a, b) for a, b in s]))]

    # 07: three segments (tests segment-wise synthesis + cross-fade concat)
    a = [w("AP", (R, 0.3)), w("dong", ("C4", 0.5)), w("tian", ("E4", 0.5)),
         w("de", ("G4", 0.4)), w("xue", ("E4", 0.8)), w("SP", (R, 0.2))]
    b = [w("AP", (R, 0.3)), w("luo", ("D4", 0.5)), w("zai", ("F4", 0.5)),
         w("wo", ("A4", 0.6)), w("jian", ("G4", 0.7), ("F4", 0.4)), w("SP", (R, 0.2))]
    c = [w("AP", (R, 0.3)), w("hua", ("E4", 0.6)), w("cheng", ("G4", 0.6)),
         w("chun", ("A4", 0.5)), w("shui", ("C5", 0.9), ("A4", 0.5), ("G4", 0.6)),
         w("SP", (R, 0.4))]
    samples["07_dong_xue.ds"] = [
        segment(*zip(*[(x, y) for x, y in a])),
        segment(*zip(*[(x, y) for x, y in b]), offset=4.0),
        segment(*zip(*[(x, y) for x, y in c]), offset=8.0),
    ]

    out_dir = ROOT / "samples"
    for name, segs in samples.items():
        path = out_dir / name
        with open(path, "w") as f:
            json.dump(segs, f, ensure_ascii=False, indent=1)
        print(f"wrote {path} ({len(segs)} segments)")


if __name__ == "__main__":
    main()
