#!/usr/bin/env python
"""Export reference-stack features for the real-data accuracy gate.

RUNS IN THE REFERENCE (PyTorch/GPU) ENVIRONMENT — the one with
`data_utils`/`modeling_utils` from github.com/facebookresearch (the
algonauts-2025 TRIBE pipeline) installed and the Algonauts dataset
downloaded.  It cannot run in the TPU build environment; it is the
"other half" of scripts/real_data_gate.py, checked in here so the two
sides of the comparison are pinned by the same code instead of prose.

For each modality it builds the study events exactly the way the
reference app does (reference algonauts2025/main.py:86-122 — StudyLoader
with the default enhancer chain), runs the feature's cached bulk compute
(`_get_data`, reference features/{text,audio,video}.py), and saves every
item's raw array to

    <out>/<modality>/<item_key>.npy

where `item_key` = sha256 of the PATH-PORTABLE item uid — the
reference's own cache uid (audio/video
``{filepath}_{offset:.2f}_{duration:.2f}``, reference audio.py:141 /
video.py:192; text ``{text}_{context}``, text.py:205) with the filepath
reduced to its basename.  The TPU gate computes the identical key
(algonauts2025_tpu/experiment/accuracy_gate.py: portable_uid/item_key),
so the join never depends on dataset mount points.

Usage (reference environment):

    python export_reference_features.py \
        --data /path/to/dataset_root --cache /path/to/exca_cache \
        --out /path/to/exported_reference_features \
        [--query "subject_timeline_index<10"] [--max-items 200] \
        [--modalities text audio video]

Then bring <out> (plus a metrics.csv from a reference recipe run) to the
TPU side and run scripts/real_data_gate.py.
"""

import argparse
import hashlib
import json
from pathlib import Path

import numpy as np


def item_key(uid: str) -> str:
    # MUST match algonauts2025_tpu.experiment.accuracy_gate.item_key
    return hashlib.sha256(uid.encode("utf-8")).hexdigest()[:32]


def portable_uid(event) -> str:
    # MUST match algonauts2025_tpu.experiment.accuracy_gate.portable_uid
    if hasattr(event, "filepath"):
        name = Path(str(event.filepath)).name
        return f"{name}_{event.offset:.2f}_{event.duration:.2f}"
    return f"{event.text}_{event.context}"


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--data", required=True, help="dataset root (DATADIR)")
    parser.add_argument("--cache", required=True, help="exca cache folder")
    parser.add_argument("--out", required=True, type=Path)
    parser.add_argument(
        "--query",
        default="subject_timeline_index<10",
        help="study query (default: the reference smoke-run subset)",
    )
    parser.add_argument("--max-items", type=int, default=None)
    parser.add_argument(
        "--modalities", nargs="+", default=["text", "audio", "video"]
    )
    args = parser.parse_args()

    # reference imports (reference algonauts2025/main.py:29-36)
    from data_utils.data import StudyLoader
    from data_utils.features.audio import Wav2VecBert
    from data_utils.features.text import LLAMA3p2
    from data_utils.features.video import VJEPA2
    from data_utils.helpers import extract_events

    infra = {"folder": args.cache, "keep_in_ram": False}
    study = StudyLoader(
        path=Path(args.data) / "algonauts2025",
        query=args.query,
        infra={"folder": args.cache},
        # the reference default enhancer chain (reference
        # algonauts2025/grids/defaults.py:61-80)
        enhancers={
            "addtext": {"name": "AddText"},
            "addsentence": {
                "name": "AddSentenceToWords",
                "max_unmatched_ratio": 0.05,
            },
            "addcontext": {
                "name": "AddContextToWords",
                "sentence_only": False,
                "max_context_len": 1024,
            },
            "removemissing": {"name": "RemoveMissing"},
            "extractaudio": {"name": "ExtractAudioFromVideo"},
            "chunkevents": {
                "name": "ChunkEvents",
                "event_type_to_chunk": "Sound",
                "max_duration": 60,
                "min_duration": 30,
            },
        },
    )
    events = study.build()

    features = {
        "text": LLAMA3p2(infra=dict(infra)),
        "audio": Wav2VecBert(infra=dict(infra)),
        "video": VJEPA2(infra=dict(infra)),
    }
    manifest: dict = {}
    for name in args.modalities:
        feature = features[name]
        evs = extract_events(events, types=feature._event_types_helper)
        if args.max_items is not None:
            evs = evs[: args.max_items]
        out_dir = args.out / name
        out_dir.mkdir(parents=True, exist_ok=True)
        print(f"[{name}] extracting {len(evs)} items ...")
        n = 0
        # _get_data yields arrays aligned with events (reference
        # audio.py:145, text.py:209, video.py:196) and caches per uid
        for event, arr in zip(evs, feature._get_data(evs)):
            uid = portable_uid(event)
            np.save(out_dir / f"{item_key(uid)}.npy", np.asarray(arr, np.float32))
            n += 1
        manifest[name] = {"items": n}
        print(f"[{name}] wrote {n} arrays to {out_dir}")

    (args.out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"manifest written to {args.out / 'manifest.json'}")


if __name__ == "__main__":
    main()
