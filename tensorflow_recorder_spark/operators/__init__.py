"""Engine operators (SURVEY.md §2): split routing, fitted transforms,
multimodal extraction, and the large-scale extension operators
(dedup / similarity / text analysis / event-time ops)."""
