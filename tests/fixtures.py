"""Synthetic Ego4D STA dataset fixture for end-to-end pipeline tests."""

import json
import os

import numpy as np


LEARNABLE_PALETTE = np.array(
    [[220, 30, 30], [30, 200, 30], [40, 60, 230], [235, 220, 30], [30, 210, 210], [230, 40, 220]],
    np.uint8,
)  # one saturated color per noun category


def make_synthetic_ego4d(root, n_videos=2, n_train=10, n_val=4, n_test=2, seed=0, fh=540, fw=720,
                         learnable=False):
    """Create fho_sta_{train,val}.json + test_unannotated + jpg frames +
    external caption files under `root`. Returns dict of useful paths.

    ``learnable=True`` paints real structure into the frames so the assembled
    system can be overfit-tested end to end: frames are a flat gray background
    and every GT box is a solid rectangle whose color encodes its noun
    category (LEARNABLE_PALETTE); the verb and TTC are deterministic
    functions of the noun, and each frame carries exactly one object."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    root = str(root)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    frames_dir = os.path.join(root, "object_frames")
    os.makedirs(frames_dir, exist_ok=True)

    videos = [f"vid-{i:04d}" for i in range(n_videos)]
    noun_categories = [
        {"id": i, "name": n}
        for i, n in enumerate(["bag", "ball_1", "indument", "knife", "onion", "pan"])
    ]
    verb_categories = [{"id": i, "name": f"verb{i}_x" if i % 2 else f"verb{i}"} for i in range(70)]
    metadata = {v: {"fps": 30.0, "frame_height": fh, "frame_width": fw} for v in videos}

    captions0, captions1 = {}, {}

    def make_annotations(n, subset, start_frame=1000):
        anns = []
        for k in range(n):
            vid = videos[k % n_videos]
            frame = start_frame + 40 * k
            uid = f"{vid}_{frame:07d}"
            n_obj = 1 if learnable else int(rng.integers(1, 3))
            objects = []
            for _ in range(n_obj):
                if learnable:
                    noun = k % 6
                    x1, y1 = rng.uniform(10, fw - 260), rng.uniform(10, fh - 200)
                    bw, bh = rng.uniform(fw * 0.25, fw * 0.4), rng.uniform(fh * 0.3, fh * 0.5)
                    verb = (noun * 7) % 70
                    ttc = 0.4 + 0.2 * noun
                else:
                    noun = int(rng.integers(0, 6))
                    x1, y1 = rng.uniform(10, fw - 200), rng.uniform(10, fh - 200)
                    bw, bh = rng.uniform(60, 180), rng.uniform(60, 180)
                    verb = int(rng.integers(0, 70))
                    ttc = float(rng.uniform(0.3, 1.8))
                objects.append(
                    {
                        "box": [float(x1), float(y1), float(min(x1 + bw, fw - 1)), float(min(y1 + bh, fh - 1))],
                        "verb_category_id": int(verb),
                        "noun_category_id": int(noun),
                        "time_to_contact": float(ttc),
                    }
                )
            anns.append(
                {
                    "uid": uid,
                    "video_id": vid,
                    "frame": frame,
                    "clip_id": k % n_videos,
                    "clip_uid": f"clip-{k % n_videos}",
                    "clip_frame": frame,
                    "objects": objects,
                }
            )
            captions0[uid] = f"an object near the {objects[0]['noun_category_id']}"
            captions1[uid] = f"person acting {objects[0]['verb_category_id']}"
            # Write the frame jpg.
            if learnable:
                img = np.full((fh, fw, 3), 128, np.uint8)
                for obj in objects:
                    bx1, by1, bx2, by2 = (int(v) for v in obj["box"])
                    img[by1:by2, bx1:bx2] = LEARNABLE_PALETTE[obj["noun_category_id"]]
            else:
                img = rng.integers(0, 255, (fh, fw, 3), dtype=np.uint8)
            Image.fromarray(img).save(os.path.join(frames_dir, f"{uid}.jpg"), quality=80)
        return anns

    train = make_annotations(n_train, "train", 1000)
    val = make_annotations(n_val, "val", 9000)
    payload = {
        "noun_categories": noun_categories,
        "verb_categories": verb_categories,
        "info": {"video_metadata": metadata},
    }
    with open(os.path.join(root, "annotations", "fho_sta_train.json"), "w") as fp:
        json.dump({**payload, "annotations": train}, fp)
    with open(os.path.join(root, "annotations", "fho_sta_val.json"), "w") as fp:
        json.dump({**payload, "annotations": val}, fp)

    test = []
    for k in range(n_test):
        vid = videos[k % n_videos]
        frame = 20000 + 50 * k
        uid = f"{vid}_{frame:07d}"
        test.append({"uid": uid, "video_uid": vid, "frame": frame, "clip_frame": frame, "clip_uid": "c"})
        img = rng.integers(0, 255, (fh, fw, 3), dtype=np.uint8)
        from PIL import Image as I

        I.fromarray(img).save(os.path.join(frames_dir, f"{uid}.jpg"), quality=80)
    with open(os.path.join(root, "annotations", "fho_sta_test_unannotated.json"), "w") as fp:
        json.dump({"annotations": test, "info": {"video_metadata": metadata}}, fp)

    ext0 = os.path.join(root, "object_lang.json")
    ext1 = os.path.join(root, "action_lang.json")
    with open(ext0, "w") as fp:
        json.dump(captions0, fp)
    with open(ext1, "w") as fp:
        json.dump(captions1, fp)

    return {"root": root, "frames_dir": frames_dir, "externals": [ext0, ext1]}
