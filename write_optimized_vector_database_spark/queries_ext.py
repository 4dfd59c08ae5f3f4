"""Extended query registrations (filled in as milestones land).

Split from queries.py so the registry core stays readable; importing
this module registers everything via side effect.
"""

from __future__ import annotations
