"""CANTUS CSV ingestion: per-folio chant transcripts.

Host-side, exact reference semantics (parse_cantus_csv.py:1-136):

- drop chants whose Mode column is ``*`` (no melody on page);
- group rows by folio (column 2), sort by on-page sequence (column 3);
- transcript text is the manuscript spelling (column 14) with ``j``s grafted
  from the standardized spelling (column 13), including the ``ihe -> ie``
  replacement;
- the returned lookup prepends the LAST chant of the PREVIOUS folio (chant
  text frequently spills across page turns);
- ``clean`` lowercases and strips to word characters + whitespace. The
  reference ran under Python 2 byte strings, where ``\\w`` is ASCII-only; we
  use ``re.ASCII`` so accented bytes are stripped identically.
"""

from __future__ import annotations

import csv
import re


def clean(text: str) -> str:
    """Regex cleanup: keep word chars/whitespace, collapse spaces, lowercase
    (parse_cantus_csv.py:5-13)."""
    text = re.sub(r"[^\s\w|]", "", text, flags=re.ASCII)
    text = re.sub(r" \| ", " ", text)
    text = re.sub(r" +", " ", text)
    return text.lower()


def combine_transcripts(standard: str, ms: str) -> str:
    """Graft ``j`` spellings from the standardized transcript onto the
    manuscript spelling (parse_cantus_csv.py:16-35)."""
    ms = ms.replace("ihe", "ie")

    if not standard:
        return ms

    j_search = r"\w*[jJ]\w*"
    for match in re.finditer(j_search, standard):
        word = match.group().lower()
        new_pat = word.replace("j", r"\w")
        ms = re.sub(new_pat, word, ms)

    return ms


def filename_to_text_func(transcript_path: str, mapping_path: str | None = None):
    """Return a lookup ``folio_to_text(seq_or_folio) -> (filename, text)``.

    Accepts an int sequence number or a str folio name; raises ``ValueError``
    for unknown or duplicated folios (parse_cantus_csv.py:38-128).
    """
    arr = []
    with open(transcript_path) as file:
        reader = csv.reader(file, delimiter=",")
        for row in reader:
            arr.append(row)
    arr = arr[1:]

    # throw away chants with no associated melody on the page (Mode == *)
    arr = [x for x in arr if not x[10] == "*" and not x[2] == "folio"]

    folio_to_chants = {}

    folio_names = sorted(set(x[2] for x in arr))

    mapping = []
    if not mapping_path:
        for i, name in enumerate(folio_names):
            mapping.append({"seq": i, "folio": name, "filename": name})
    else:
        with open(mapping_path) as file:
            reader = csv.reader(file, delimiter=",")
            next(reader)  # header
            for row in reader:
                mapping.append(
                    {"seq": int(row[0]), "folio": row[1], "filename": row[2]}
                )

    for name in folio_names:
        chant_rows = [x for x in arr if x[2] == name]
        chant_rows.sort(key=lambda x: int(x[3]))
        chants = [combine_transcripts(x[13], x[14]) for x in chant_rows]
        folio_to_chants[name] = chants

    def folio_to_text(inp):
        if type(inp) == int:
            find_folio = [(i, x) for (i, x) in enumerate(mapping) if inp == x["seq"]]
        else:
            find_folio = [(i, x) for (i, x) in enumerate(mapping) if inp == x["folio"]]

        if not find_folio:
            raise ValueError("folio / seq {} not found".format(inp))
        if len(find_folio) > 1:
            raise ValueError("duplicates found for {}".format(inp))

        idx, entry = find_folio[0]
        folio = entry["folio"]
        fname = entry["filename"]
        prev_entry = mapping[idx - 1]
        prev_folio = prev_entry["folio"]

        # prepend the last chant of the previous page, if any
        if prev_folio in folio_to_chants:
            text = folio_to_chants[prev_folio][-1]
        else:
            text = ""

        # a page may carry only text continued from the previous page
        if folio in folio_to_chants:
            for chant in folio_to_chants[folio]:
                text = text + " " + chant

        fname = fname.replace("CF-", "")
        return fname, clean(text)

    return folio_to_text
