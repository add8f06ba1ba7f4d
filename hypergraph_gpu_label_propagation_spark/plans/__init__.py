"""Physical-plan utilities: skew handling and plan inspection."""
