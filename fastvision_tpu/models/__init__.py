"""Model zoos: classification, detection, video (SURVEY.md §2.3)."""
from . import classification, detection, video
