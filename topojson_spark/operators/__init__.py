"""Pipeline stages: extract -> join -> cut -> dedup -> hashmap (SURVEY.md §3)."""
