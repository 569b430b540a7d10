"""Check operators. Each module exposes pure DataFrame->DataFrame functions;
no operator collects to the driver. See SURVEY.md §2 for the inventory."""
