import sys

from .cli import main

try:
    sys.exit(main())
except BrokenPipeError:  # e.g. `pykmer-tpu gzi x.gzi | head`
    sys.exit(0)
