"""Graph algorithm operators — the reference's procedure surface
(SURVEY.md §2.3/§2.4) re-expressed as iterative DataFrame plans."""
