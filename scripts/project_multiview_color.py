"""Back-project per-frame RGB colors onto scene points (mean across views).

1:1 CLI equivalent of the reference ``scripts/project_multiview_color.py``
(378 LoC): thin alias over ``project_multiview_labels.py --what color``,
which implements the shared depth-consistent projection for both label and
color aggregation.

Demo: ``python scripts/project_multiview_color.py --synthetic --out /tmp/col``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import project_multiview_labels as _labels


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return _labels.main(argv + ["--what", "color"])


if __name__ == "__main__":
    main()
