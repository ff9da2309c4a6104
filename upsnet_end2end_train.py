"""Reference-named alias: `python upsnet_end2end_train.py --cfg <yaml>`
(uber-research/UPSNet entry-point name). Forwards to tools/train.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools.train import main  # noqa: E402

if __name__ == "__main__":
    main()
