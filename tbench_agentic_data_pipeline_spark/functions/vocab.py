"""Approval vocabulary: the closed category/tag sets and their guards.

The reference validates every approval's category and tags against a fixed
vocabulary before deriving the production row
(``approve_datapoint.py:82-89``, vocabulary + rules in
``shared_tools/categories_tags.py``): the category must be a known value,
tags are ``|``-separated, at least one, at most three, all from the tag
vocabulary. The sets below reproduce that vocabulary (data, observed from
the reference's shipped lists); the guards re-express the rules.

Validation happens driver-side on approval *parameters* (human review
decisions — inherently small), never per-corpus-row, so plain Python is
the right altitude; nothing here touches the Spark plan.
"""

from __future__ import annotations

CATEGORIES: frozenset[str] = frozenset({
    "data-processing", "data-science", "debugging", "file-operations",
    "games", "machine-learning", "mathematics", "model-training",
    "scientific-computing", "security", "software-engineering",
    "system-administration",
})

TAGS: frozenset[str] = frozenset({
    "C", "RL", "algorithm-implementation", "algorithms", "analysis", "api",
    "audio-processing", "automation", "base64", "binary-processing",
    "build-automation", "caching", "cli", "cloud", "coding",
    "compiler-migration", "compression", "data", "data-extraction",
    "data-processing", "data-science", "debugging", "decrypt", "encryption",
    "file-operations", "file-recovery", "forensics", "games", "git",
    "images", "information-retrieval", "interactive", "logic",
    "long-context", "machine-learning", "mathematics", "maze",
    "model-training", "multiprocessing", "networking", "numpy",
    "optimization", "package-management", "parallel-computing",
    "pathfinding", "pattern-recognition", "performance-optimization",
    "physics", "python", "pytorch", "reinforcement-learning", "scheduling",
    "scientific-computation", "security", "signal-processing",
    "software-engineering", "software-installation", "string-manipulation",
    "synchronization", "sys-admin", "system", "text-processing",
    "troubleshooting", "unit-testing", "version-control", "web",
    "web-scraping", "web-server",
})

MAX_TAGS = 3


def check_category(category: str) -> None:
    """Raise ValueError unless ``category`` is in the closed set."""
    if category not in CATEGORIES:
        raise ValueError(
            f"invalid category {category!r}; valid: "
            + ", ".join(sorted(CATEGORIES))
        )


def check_tags(tags: str) -> None:
    """Raise ValueError unless ``tags`` is a valid ``|``-separated list:
    1..MAX_TAGS entries, every entry in the tag vocabulary."""
    parts = [t.strip() for t in tags.split("|") if t.strip()]
    if not parts:
        raise ValueError("at least one tag is required")
    if len(parts) > MAX_TAGS:
        raise ValueError(f"too many tags ({len(parts)} > {MAX_TAGS})")
    unknown = sorted(set(parts) - TAGS)
    if unknown:
        raise ValueError("invalid tags: " + ", ".join(unknown))


# Cancellation taxonomy (``cancel_datapoint.py:26-32``) — why a reviewed
# datapoint was rejected rather than approved.
CANCELLATION_CATEGORIES: frozenset[str] = frozenset({
    "scope", "unfixable", "complexity", "quality", "other",
})


def check_cancellation_category(category: str) -> None:
    """Raise ValueError unless ``category`` is a known cancellation kind."""
    if category not in CANCELLATION_CATEGORIES:
        raise ValueError(
            f"invalid cancellation category {category!r}; valid: "
            + ", ".join(sorted(CANCELLATION_CATEGORIES))
        )
