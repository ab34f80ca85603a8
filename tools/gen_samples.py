"""Author the shipped sample scores — original melodies with pinyin lyrics in
the reference .ds format (samples/*.ds: text/ph_seq/ph_num/note_seq/note_dur/
note_slur/offset; acoustic-ready segments add ph_dur + dense f0_seq).

Two tiers:

* 02..07 — hand-written short phrases covering specific regimes (registers,
  slurs, fast runs, extension syllables, multi-segment).
* 08..10 — procedurally composed full songs at reference scale
  (30-60 s, 6-10 segments, dense 5 ms f0 curves with portamento + vibrato +
  drift, like the reference's samples/00_我多想说再见啊.ds with its 30
  segments and 1000+-point f0_seq per segment). 08/09 are acoustic-ready;
  10 is score-only for the variance -> acoustic chain at realistic length.

The reference ships real songs (with credits); these are original/generated
compositions so the repo stays self-contained and unencumbered.

Run: python tools/gen_samples.py
"""

import json
import math
import pathlib
import random

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


# ---------------------------------------------------------------- procedural

NOTE_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]


def midi_to_name(m):
    return f"{NOTE_NAMES[m % 12]}{m // 12 - 1}"


def name_to_midi(n):
    pitch = NOTE_NAMES.index(n[:-1])
    return (int(n[-1]) + 1) * 12 + pitch


def compose_song(seed, n_segments, gap=0.8, tonic="D4", minutes_hint=None):
    """Compose a deterministic song: each segment is a phrase of 8-14 words on
    a pentatonic scale with phrase-arc melodic motion, slurs on long finals,
    and phrase-final lengthening. Returns a list of word-level segments:
    [(offset, [(word, [(note, dur), ...]), ...]), ...]."""
    rng = random.Random(seed)
    scale_steps = [0, 2, 4, 7, 9]  # pentatonic degrees
    base = name_to_midi(tonic)
    syllables = sorted(s for s in TABLE if s.isalpha())
    segments = []
    offset = 1.0
    for si in range(n_segments):
        n_words = rng.randint(8, 14)
        degree = rng.randint(3, 6)  # start mid-scale (octave-extended degrees)
        words = [w("AP", (R, round(rng.uniform(0.25, 0.5), 2)))]
        arc_peak = rng.uniform(0.35, 0.7)  # fraction of the phrase at the melodic peak
        for wi in range(n_words):
            frac = wi / max(n_words - 1, 1)
            drift = 1 if frac < arc_peak else -1  # rise to the peak, then fall
            step = rng.choice([drift, drift, drift * 2, -drift, 0])
            degree = min(max(degree + step, 0), 9)
            midi = base + 12 * (degree // 5) + scale_steps[degree % 5]
            final = wi == n_words - 1
            dur = rng.choice([1.0, 1.25, 1.5] if final else [0.25, 0.25, 0.5, 0.5, 0.5, 0.75])
            notes = [(midi_to_name(midi), dur)]
            if final and rng.random() < 0.7:  # slurred release on the phrase final
                rel = base + 12 * (degree // 5) + scale_steps[max(degree - 1, 0) % 5]
                notes.append((midi_to_name(rel), rng.choice([0.5, 0.75])))
            words.append(w(rng.choice(syllables), *notes))
        words.append(w("SP", (R, round(rng.uniform(0.2, 0.4), 2))))
        segments.append((round(offset, 3), words))
        offset += sum(d for _, wn in words for _, d in wn) + gap
    return segments


def word_ph_dur(words):
    """Distribute each word's note time over its phonemes: a consonant onset
    takes min(0.1 s, 25%) and the vowel the rest (AP/SP keep their full time)."""
    ph_dur = []
    for word, wnotes in words:
        total = sum(d for _, d in wnotes)
        phs = [word] if word in ("AP", "SP") else TABLE[word]
        if len(phs) == 1:
            ph_dur.append(total)
        else:
            onset = min(0.1, 0.25 * total)
            ph_dur += [onset] + [(total - onset) / (len(phs) - 1)] * (len(phs) - 1)
    return ph_dur


def dense_f0(words, seed, timestep=0.005):
    """Dense per-5 ms f0 curve over a segment: note pitches with ~80 ms cosine
    portamento at boundaries, delayed-onset vibrato on notes >= 0.5 s, and a
    slow random drift — shaped like real extracted contours (rests keep an
    interpolated continuation as pyworld+interp_uv would produce)."""
    rng = random.Random(seed)
    notes = []  # (start, end, midi or None)
    t = 0.0
    for word, wnotes in words:
        for note, dur in wnotes:
            notes.append((t, t + dur, None if note == R else name_to_midi(note)))
            t += dur
    total = t
    n = int(total / timestep) + 1
    # base midi curve: nearest voiced note, then portamento smoothing
    voiced = [(s, e, m) for s, e, m in notes if m is not None] or [(0, total, 60)]
    midi = []
    for i in range(n):
        ti = i * timestep
        cur = min(voiced, key=lambda v: 0.0 if v[0] <= ti < v[1] else min(abs(ti - v[0]), abs(ti - v[1])))
        midi.append(float(cur[2]))
    # cosine portamento over transitions: smooth with a short moving window
    port = int(0.08 / timestep)
    sm = []
    for i in range(n):
        lo, hi = max(0, i - port // 2), min(n, i + port // 2 + 1)
        win = midi[lo:hi]
        weights = [0.5 - 0.5 * math.cos(2 * math.pi * (j + 0.5) / len(win)) for j in range(len(win))]
        sm.append(sum(v * wt for v, wt in zip(win, weights)) / sum(weights))
    # vibrato on long notes + drift
    drift = 0.0
    out = []
    for i in range(n):
        ti = i * timestep
        vib = 0.0
        for s, e, m in voiced:
            if s <= ti < e and e - s >= 0.5:
                rel = ti - s
                ramp = min(1.0, max(0.0, (rel - 0.15) / 0.25))
                vib = 0.3 * ramp * math.sin(2 * math.pi * 5.5 * rel)
                break
        drift = 0.995 * drift + rng.uniform(-0.004, 0.004)
        out.append(440.0 * 2 ** ((sm[i] + vib + drift * 25 - 69) / 12))
    return out, timestep


def song_to_ds(song, *, acoustic_ready, f0_seed=0):
    segs = []
    for si, (offset, words) in enumerate(song):
        seg = segment(*zip(*[(a, b) for a, b in words]), offset=offset)
        if acoustic_ready:
            seg["ph_dur"] = " ".join(f"{d:.4f}" for d in word_ph_dur(words))
            f0, ts = dense_f0(words, seed=f0_seed * 1000 + si)
            seg["f0_timestep"] = str(ts)
            seg["f0_seq"] = " ".join(f"{v:.1f}" for v in f0)
        segs.append(seg)
    return segs


def main():
    samples = {}

    # 08/09: procedurally composed acoustic-ready songs at reference scale
    samples["08_qiu_yu.ds"] = song_to_ds(
        compose_song(seed=81, n_segments=7), acoustic_ready=True, f0_seed=8)
    samples["09_xing_he.ds"] = song_to_ds(
        compose_song(seed=92, n_segments=10, tonic="G4"), acoustic_ready=True, f0_seed=9)
    # 10: long score-only input for the variance -> acoustic chain
    samples["10_shan_lu.ds"] = song_to_ds(
        compose_song(seed=103, n_segments=6, tonic="A3"), acoustic_ready=False)

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
