"""Coref dictionaries — the analog of ``dcoref/Dictionaries.java`` (572 LoC
of list loading in the reference, from files under
``data/edu/stanford/nlp/dcoref/``): gender, animacy, and demonym tables used
by the sieve cascade's agreement gates and the demonym / role-appositive
precise constructs (``dcoref/Rules.java``).

Compact public-knowledge tables (common English first names, gendered role
nouns, country demonyms) — broadcast-sized driver constants, the same
deployment shape as the reference's dictionary files.
"""

from __future__ import annotations

MALE_NAMES = {
    "barack", "george", "john", "chris", "james", "robert", "michael",
    "david", "william", "richard", "thomas", "charles", "daniel", "paul",
    "mark", "donald", "steven", "andrew", "brian", "kevin", "jason",
    "frank", "henry", "jacob", "louis", "oscar", "simon", "victor", "tom",
    "walter", "felix", "hugo", "peter", "edward", "samuel", "jerry",
    # r4 breadth (dcoref male.unigrams subset)
    "anthony", "joseph", "joshua", "matthew", "christopher", "ryan",
    "nicholas", "eric", "stephen", "jonathan", "justin", "brandon",
    "timothy", "adam", "aaron", "nathan", "patrick", "sean", "carl",
    "harold", "roger", "gerald", "keith", "lawrence", "terry", "ralph",
    "eugene", "vincent", "leonard", "marco", "luis", "juan", "carlos",
    "pedro", "diego", "ivan", "boris", "hans", "franz", "otto", "gustav",
    "casimir", "aurelio", "rupert", "edmund", "leopold",
}
FEMALE_NAMES = {
    "marie", "jane", "mary", "sarah", "anna", "laura", "emma", "clara",
    "elena", "grace", "irene", "karen", "maria", "nora", "petra", "rosa",
    "tessa", "diane", "ivy", "alice", "julia", "susan", "linda", "nancy",
    "karen", "betty", "helen", "sandra", "donna", "carol", "ruth", "sara",
    "matilda", "beatrix", "cordelia",
    # r4 breadth (dcoref female.unigrams subset)
    "jennifer", "jessica", "ashley", "amanda", "stephanie", "melissa",
    "nicole", "elizabeth", "megan", "rachel", "hannah", "katherine",
    "christine", "deborah", "sharon", "cynthia", "kathleen", "shirley",
    "angela", "brenda", "pamela", "katie", "sophie", "charlotte", "amelia",
    "olivia", "isabella", "mia", "ingrid", "astrid", "greta", "sofia",
    "lucia", "carmen", "rosa", "elena", "nadia", "vera", "tatiana",
    "sanna", "cecilia",
}
MALE_NOUNS = {
    "man", "men", "boy", "father", "son", "brother", "husband", "uncle",
    "grandfather", "king", "prince", "actor", "waiter", "gentleman", "sir",
    "mr.", "widower", "nephew", "duke", "emperor", "grandson", "stepfather",
    "godfather", "bridegroom", "lad", "monk", "priest", "baron", "count",
    "earl", "lord", "tsar", "sultan", "caliph", "patriarch", "papa", "dad",
}
FEMALE_NOUNS = {
    "woman", "women", "girl", "mother", "daughter", "sister", "wife",
    "aunt", "grandmother", "queen", "princess", "actress", "waitress",
    "lady", "madam", "mrs.", "ms.", "widow", "niece", "duchess", "empress",
    "granddaughter", "stepmother", "godmother", "bride", "lass", "nun",
    "priestess", "baroness", "countess", "tsarina", "matriarch", "mama",
    "mom", "heroine", "hostess", "ballerina",
}
# animate role/person nouns (Dictionaries.animateWords subset): these can
# antecede he/she/who and license role appositives ("president Obama")
ANIMATE_NOUNS = {
    "person", "people", "president", "senator", "minister", "mayor",
    "judge", "chairman", "director", "manager", "engineer", "teacher",
    "professor", "student", "doctor", "lawyer", "attorney", "organizer",
    "author", "writer", "singer", "artist", "painter", "leader", "founder",
    "officer", "official", "spokesman", "spokeswoman", "journalist",
    "reporter", "scientist", "researcher", "analyst", "economist", "ceo",
    "coach", "player", "driver", "farmer", "worker", "employee", "chief",
    "secretary", "governor", "ambassador", "general", "colonel", "captain",
    "nominee", "candidate", "champion", "graduate", "pianist", "chancellor",
    # profession/agent breadth (dcoref animate.unigrams carries thousands
    # of such nouns; r4 widening)
    "physicist", "chemist", "historian", "musician", "volunteer",
    "pioneer", "editor", "salesman", "statesman", "prosecutor", "defendant",
    "witness", "curator", "librarian", "architect", "surgeon", "nurse",
    "pilot", "soldier", "athlete", "actor", "actress", "poet", "novelist",
    "biographer", "diplomat", "investigator", "auditor", "regulator",
    "shareholder", "successor", "predecessor", "advocate", "spokesperson",
    # r5 breadth
    "client", "colleague", "resident", "citizen", "visitor", "applicant",
    "guest", "customer", "patient", "voter", "fan", "neighbor", "tenant",
} | MALE_NOUNS | FEMALE_NOUNS
# inanimate pronouns/nouns never corefer with PERSON antecedents
INANIMATE_NOUNS = {
    "company", "corporation", "group", "startup", "university", "school",
    "bank", "institute", "city", "country", "report", "contract", "budget",
    "system", "project", "building", "bridge", "law", "policy", "election",
    # r4 breadth (dcoref inanimate.unigrams subset)
    "government", "committee", "agency", "ministry", "parliament",
    "council", "court", "tribunal", "firm", "market", "economy", "industry",
    "product", "service", "document", "statement", "decision", "ruling",
    "verdict", "trial", "hearing", "inquiry", "study", "survey", "plan",
    "program", "agreement", "treaty", "deal", "merger", "buyout",
    "machine", "engine", "vehicle", "ship", "aircraft", "satellite",
    "storm", "earthquake", "flood", "fire", "disease", "virus",
}
# country/region → demonym (Dictionaries.demonyms subset;
# dcoref/Rules.java entityIsDemonym): "France" ↔ "French"
DEMONYMS = {
    "france": "french", "germany": "german", "italy": "italian",
    "spain": "spanish", "portugal": "portuguese", "england": "english",
    "britain": "british", "ireland": "irish", "scotland": "scottish",
    "america": "american", "canada": "canadian", "mexico": "mexican",
    "brazil": "brazilian", "argentina": "argentine", "china": "chinese",
    "japan": "japanese", "india": "indian", "russia": "russian",
    "poland": "polish", "greece": "greek", "turkey": "turkish",
    "egypt": "egyptian", "kenya": "kenyan", "nigeria": "nigerian",
    "australia": "australian", "austria": "austrian", "norway": "norwegian",
    "sweden": "swedish", "denmark": "danish", "finland": "finnish",
    "netherlands": "dutch", "belgium": "belgian", "switzerland": "swiss",
    "hungary": "hungarian", "croatia": "croatian", "serbia": "serbian",
    "ukraine": "ukrainian", "israel": "israeli", "iran": "iranian",
    "iraq": "iraqi", "vietnam": "vietnamese", "korea": "korean",
    # r4 breadth
    "wales": "welsh", "iceland": "icelandic", "romania": "romanian",
    "bulgaria": "bulgarian", "slovakia": "slovak", "slovenia": "slovene",
    "lithuania": "lithuanian", "latvia": "latvian", "estonia": "estonian",
    "chile": "chilean", "peru": "peruvian", "colombia": "colombian",
    "venezuela": "venezuelan", "cuba": "cuban", "bolivia": "bolivian",
    "morocco": "moroccan", "algeria": "algerian", "tunisia": "tunisian",
    "ethiopia": "ethiopian", "ghana": "ghanaian", "uganda": "ugandan",
    "tanzania": "tanzanian", "thailand": "thai", "indonesia": "indonesian",
    "malaysia": "malaysian", "philippines": "filipino",
    "pakistan": "pakistani", "bangladesh": "bangladeshi", "nepal": "nepali",
    "afghanistan": "afghan", "syria": "syrian", "lebanon": "lebanese",
    "jordan": "jordanian", "saudi arabia": "saudi", "qatar": "qatari",
    "mongolia": "mongolian", "kazakhstan": "kazakh",
}
_DEMONYM_TO_PLACE = {v: k for k, v in DEMONYMS.items()}


def gender_of(text: str, head_word: str | None = None) -> str:
    """MALE / FEMALE / UNKNOWN from the first-name and gendered-noun tables
    (Dictionaries.gender lookup order: name list, then head noun)."""
    first = text.split()[0].lower() if text else ""
    if first in MALE_NAMES:
        return "MALE"
    if first in FEMALE_NAMES:
        return "FEMALE"
    # leading gendered title/noun: "Mr. Smith", "Mrs. Jones"
    if first in MALE_NOUNS:
        return "MALE"
    if first in FEMALE_NOUNS:
        return "FEMALE"
    hw = (head_word or (text.split()[-1] if text else "")).lower()
    if hw in MALE_NOUNS:
        return "MALE"
    if hw in FEMALE_NOUNS:
        return "FEMALE"
    return "UNKNOWN"


def is_animate(ner: str, head_word: str) -> bool:
    if ner == "PERSON":
        return True
    if ner in ("ORGANIZATION", "LOCATION"):
        return False
    hw = head_word.lower()
    # plural role nouns ("the workers … them"): dcoref's animate.unigrams
    # lists both numbers; this subset keys singular + an -s fallback
    return hw in ANIMATE_NOUNS or (
        hw.endswith("s") and not hw.endswith("ss")
        and hw[:-1] in ANIMATE_NOUNS)


def demonym_match(a: str, b: str) -> bool:
    """True iff one text is the demonym of the other's place."""
    la, lb = a.lower(), b.lower()
    return DEMONYMS.get(la) == lb or DEMONYMS.get(lb) == la
