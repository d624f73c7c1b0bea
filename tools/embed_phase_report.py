"""Aggregate SVECALIGN_EMBED_PROFILE per-file lines out of a pipeline log.

The embed stage logs one line per encoded file:

    profile <stem>: 12.34s total | stage_wait_s=0.51 forward_dispatch_s=...

This sums them into the phase breakdown the VoxPopuli budget needs
(compile floor vs device compute vs pulls vs host residue), per embed
stage invocation (the pipeline runs embed once per language, then
embed_align). Usage:

    python tools/embed_phase_report.py /tmp/rh_sonar2x.log
"""

import re
import sys


def main(path: str) -> None:
    runs = []  # one dict per ">>> ...embed/embed_align" stage invocation
    cur = None
    stage_re = re.compile(r">>> (svecalign_tpu\.[a-z_.]+) (.*)")
    prof_re = re.compile(
        r"profile (\S+): ([0-9.]+)s total \| (.*)"
    )
    for line in open(path, errors="replace"):
        m = stage_re.search(line)
        if m:
            mod = m.group(1).rsplit(".", 1)[1]
            if mod in ("embed", "embed_align"):
                lang = "tgt" if "--use_tgt" in m.group(2) else "src"
                cur = {"stage": f"{mod}/{lang}", "files": 0, "total_s": 0.0}
                runs.append(cur)
            elif mod in (
                "detect_untranslate_segs",
                "detect_untranslate_concats",
            ):
                # --overlap_untrans runs these on a background thread: their
                # banners interleave with the foreground embed stage's
                # profile lines and must not end the attribution window
                pass
            else:
                cur = None
            continue
        m = prof_re.search(line)
        if m and cur is not None:
            cur["files"] += 1
            cur["total_s"] += float(m.group(2))
            for kv in m.group(3).split():
                k, v = kv.split("=")
                cur[k] = cur.get(k, 0.0) + float(v)

    for r in runs:
        if not r["files"]:
            continue
        total = r.pop("total_s")
        files = r.pop("files")
        stage = r.pop("stage")
        known = sum(v for k, v in r.items() if k.endswith("_s"))
        parts = " ".join(
            f"{k}={v:.1f}" if k.endswith("_s") else f"{k}={int(v)}"
            for k, v in sorted(r.items())
        )
        print(
            f"{stage}: files={files} wall={total:.1f}s "
            f"unattributed={total - known:.1f}s | {parts}"
        )
        # unattributed = host work between timer windows: wav decode waits,
        # numpy staging, chunk bookkeeping, and the post-pull host stall —
        # everything that is neither dispatch, stage-wait, nor pull.


if __name__ == "__main__":
    main(sys.argv[1])
