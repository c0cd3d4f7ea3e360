package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Accuracy gate for the trigram language identifier: 40 HELD-OUT sentences
  * (10 per language, none present in [[LangIdProfileGen]]'s training
  * corpora) must be identified at ≥95%. A stopword-list heuristic scores
  * far below this on sentences that avoid the listed words; a trigram
  * profile does not.
  */
class LangIdSpec extends SparkSuite with Matchers {

  private val held: Seq[(String, String)] = Seq(
    "en" -> "a quiet afternoon spent fishing beside the river brings calm thoughts",
    "en" -> "several travelers asked about cheap rooms near the central station",
    "en" -> "her grandfather repairs broken clocks in his small workshop downtown",
    "en" -> "fresh snow covered the rooftops before anyone had woken up",
    "en" -> "the committee agreed to postpone the vote until next thursday",
    "en" -> "strong winds pushed the sailboat far away from the harbor",
    "en" -> "every spring the orchard fills with white and pink blossoms",
    "en" -> "he whispered an apology and slipped quietly out of the room",
    "en" -> "building a wooden fence takes patience and the right tools",
    "en" -> "the nurses worked through the night caring for the patients",
    "fr" -> "un apres midi tranquille passe a pecher au bord de la riviere apaise l esprit",
    "fr" -> "plusieurs voyageurs ont demande des chambres bon marche pres de la gare centrale",
    "fr" -> "son grand pere repare de vieilles horloges dans son petit atelier en ville",
    "fr" -> "la neige fraiche couvrait les toits avant que personne ne soit reveille",
    "fr" -> "le comite a decide de reporter le vote jusqu a jeudi prochain",
    "fr" -> "des vents violents ont pousse le voilier loin du port",
    "fr" -> "chaque printemps le verger se remplit de fleurs blanches et roses",
    "fr" -> "il a murmure des excuses et il est sorti doucement de la piece",
    "fr" -> "construire une cloture en bois demande de la patience et de bons outils",
    "fr" -> "les infirmieres ont travaille toute la nuit pour soigner les malades",
    "de" -> "ein ruhiger nachmittag beim angeln am fluss bringt gelassene gedanken",
    "de" -> "mehrere reisende fragten nach guenstigen zimmern nahe dem hauptbahnhof",
    "de" -> "ihr grossvater repariert kaputte uhren in seiner kleinen werkstatt",
    "de" -> "frischer schnee bedeckte die daecher bevor jemand aufgewacht war",
    "de" -> "der ausschuss beschloss die abstimmung auf naechsten donnerstag zu verschieben",
    "de" -> "starke winde trieben das segelboot weit vom hafen weg",
    "de" -> "jeden fruehling fuellt sich der obstgarten mit weissen und rosa blueten",
    "de" -> "er fluesterte eine entschuldigung und schlich leise aus dem zimmer",
    "de" -> "einen holzzaun zu bauen braucht geduld und das richtige werkzeug",
    "de" -> "die pflegerinnen arbeiteten die ganze nacht um die kranken zu versorgen",
    "es" -> "una tarde tranquila pescando junto al rio trae pensamientos serenos",
    "es" -> "varios viajeros preguntaron por habitaciones baratas cerca de la estacion central",
    "es" -> "su abuelo arregla relojes rotos en su pequeno taller del centro",
    "es" -> "la nieve fresca cubria los tejados antes de que nadie despertara",
    "es" -> "el comite acordo aplazar la votacion hasta el proximo jueves",
    "es" -> "vientos fuertes empujaron el velero lejos del puerto",
    "es" -> "cada primavera el huerto se llena de flores blancas y rosadas",
    "es" -> "el susurro una disculpa y salio despacio de la habitacion",
    "es" -> "construir una cerca de madera requiere paciencia y buenas herramientas",
    "es" -> "las enfermeras trabajaron toda la noche cuidando a los enfermos")

  test("trigram langid identifies >=95% of held-out sentences") {
    import spark.implicits._
    val docs = held.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.detectLang(spark, docs).collect()
    out.length shouldBe held.size
    val correct = out.count(r => r.getString(2) == r.getString(1))
    withClue(s"correct=$correct/${held.size}: ") {
      correct.toDouble / held.size should be >= 0.95
    }
  }

  test("no-letter and empty docs are 'und'") {
    import spark.implicits._
    val docs = Seq((1L, "xx", "12345 !!!"), (2L, "xx", ""), (3L, "xx", "ab"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.detectLang(spark, docs).collect()
    out.foreach(r => r.getString(2) shouldBe "und")
  }
}
