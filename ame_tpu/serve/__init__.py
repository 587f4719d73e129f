"""HTTP mastering service — the backend the reference's web client implies
but does not ship (templates/index.html, SURVEY.md C19/§3.5)."""
