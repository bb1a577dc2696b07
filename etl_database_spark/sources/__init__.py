"""Source/sink adapters: Excel conversion, HTTP fetch, file archive.
External-edge connectors (Gmail, SMTP) are thin driver-side interfaces
kept mockable — they feed the file-watcher directory, they are not
Spark operators (SURVEY.md §2.1 S9-S12)."""
