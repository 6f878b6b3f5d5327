#!/usr/bin/env python3
"""Generate Python-parity golden cases by EXECUTING the reference's pure
functions (/root/reference/utils.py) on deterministic random inputs.

The json5 module isn't installed; utils.py only uses it inside
split_content_and_json, which we don't exercise here — a stub module
satisfies the import. CJK inputs are excluded: the reference's CJK
branch raises TypeError (utils.py:300, SURVEY.md Q2) — our engine
implements the intended semantics there, a documented divergence.

Output: src/test/resources/parity_cases.json, consumed by ParitySpec.
"""
import json
import random
import string
import sys
import types

for mod in ('json5', 'aiohttp', 'requests'):
    sys.modules[mod] = types.ModuleType(mod)  # satisfy unused imports
sys.path.insert(0, '/root/reference')
from utils import (clean_string, get_keywords, count_words_in_string,
                   get_top_k_records, simple_rag, is_int_convertible,
                   is_float_convertible, convert_to_boolean, truncate_string)
import re as _re
import task as ref_task

rng = random.Random(20260812)

ALPHA = string.ascii_letters + string.digits + " .,!?-_'\"@#$%&*()[]{}:;/\\\n\t"


def rand_text(n):
    return "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, n)))


cases = []

for _ in range(120):
    s = rand_text(80)
    cases.append({"fn": "clean_string", "input": s, "expected": clean_string(s)})

for _ in range(120):
    s = rand_text(60)
    cases.append({"fn": "get_keywords", "input": s, "expected": get_keywords(s)})

for _ in range(80):
    s = rand_text(40)
    kws = [rand_text(6) for _ in range(rng.randint(0, 5))]
    cases.append({"fn": "count_words", "input": s, "keywords": kws,
                  "expected": count_words_in_string(s, kws)})

for _ in range(40):
    query = rand_text(25)
    records = [rand_text(40) for _ in range(rng.randint(1, 12))]
    k = rng.randint(1, 6)
    result = simple_rag(query, records, k)
    cases.append({"fn": "simple_rag", "query": query, "records": records,
                  "k": k, "expected": [[i, s] for i, s in result]})

num_pool = ["5.0", "5.5", "-3", "abc", "", "1e3", "0.0", "  7 ", "nan",
            "inf", "-0.5", "10.00", "x1", "1.2.3", "+4"]
for v in num_pool:
    cases.append({"fn": "is_int", "input": v, "expected": is_int_convertible(v)})
    cases.append({"fn": "is_float", "input": v, "expected": is_float_convertible(v)})

bool_pool = ["true", "T", "YES", "y", "false", "F", "no", "N", "1", "0",
             "1.0", "0.0", "2", "maybe", ""]
for v in bool_pool:
    try:
        cases.append({"fn": "to_bool", "input": v, "expected": convert_to_boolean(v)})
    except ValueError:
        cases.append({"fn": "to_bool", "input": v, "expected": None})

for _ in range(30):
    s = rand_text(50)
    n = rng.randint(0, 60)
    cases.append({"fn": "truncate", "input": s, "n": n,
                  "expected": truncate_string(s, n)})

# ---- task.py functions (F6/F9/F10), executed from the reference ----
fx = ref_task.FileExtractor()
for _ in range(60):
    body = "\n".join(rand_text(30) for _ in range(rng.randint(1, 30)))
    start = rand_text(6) or "S"
    end = rand_text(6) or "E"
    placed = rng.random()
    if placed < 0.5:  # both markers present
        text = f"{rand_text(20)} {start} {body} {end} {rand_text(10)}"
    elif placed < 0.8:  # end missing → 20-line fallback
        text = f"{rand_text(20)} {start} {body}"
    else:  # start missing → ""
        text = body
    cases.append({"fn": "markers", "text": text, "start": start, "end": end,
                  "expected": fx._extract_content_between_markers(text, start, end)})

for _ in range(60):
    target = rand_text(90)
    t = ref_task.PlanTask(None, None, 1, "plan")
    t.title = "Task 1"
    t.target = target
    t.update_title_from_target()
    cases.append({"fn": "title", "input": target, "expected": t.title})

for _ in range(40):
    title = rand_text(40)
    ct = rng.choice(["plan", "note", "story", "unknown", "REPORT", "poem"])
    safe = _re.sub(r'[^\w\s-]', '', title).strip()
    safe = _re.sub(r'[-\s]+', '_', safe)
    ext = ref_task.FileExtractor.get_file_extension(ct)
    cases.append({"fn": "filename", "title": title, "ctype": ct,
                  "expected": f"{safe[:30]}.{ext}"})

out = "src/test/resources/parity_cases.json"
import os
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(cases, f, indent=1)
print(f"wrote {out}: {len(cases)} cases")
