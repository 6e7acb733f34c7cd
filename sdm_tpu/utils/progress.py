"""Terminal progress bar (parity with /root/reference/utils/utils.py:8-36).

Note the samplers themselves no longer need per-step progress (the whole
reverse trajectory is one on-device scan); this is used for host-side loops
(ensemble model chaining, dataset preprocessing)."""

from __future__ import annotations


def print_progress_bar(iteration, total, prefix="", suffix="", decimals=1,
                       length=100, fill="█", print_end="\r", log=print):
    percent = ("{0:." + str(decimals) + "f}").format(
        100 * (iteration / float(total)))
    filled = int(length * iteration // total)
    bar = fill * filled + "-" * (length - filled)
    log(f"\r{prefix} |{bar}| {percent}% {suffix}", end=print_end)
    if iteration == total:
        log()
