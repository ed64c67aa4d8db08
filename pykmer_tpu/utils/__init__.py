from .timer import Timer
from .checksum import sha256_file
